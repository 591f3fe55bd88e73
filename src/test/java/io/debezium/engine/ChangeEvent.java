package io.debezium.engine;

/** Test stub of the public embedded-engine event surface graft reflects
 * on (the real API ships in debezium-api, absent from this offline
 * build). Only the members DebeziumRuntime touches exist. */
public interface ChangeEvent<K, V> {
    K key();
    V value();
}
