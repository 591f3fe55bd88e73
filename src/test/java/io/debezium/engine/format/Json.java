package io.debezium.engine.format;

/** Test stub format marker (see ChangeEvent). */
public final class Json {
    private Json() {}
}
