package io.debezium.engine;

/** Test stub of the public embedded-engine API surface graft reflects on
 * (see ChangeEvent). create() hands out the in-memory StubEngine. */
public interface DebeziumEngine<R> extends Runnable, AutoCloseable {

    interface Builder<R> {
        Builder<R> using(java.util.Properties props);
        Builder<R> notifying(java.util.function.Consumer<R> consumer);
        DebeziumEngine<R> build();
    }

    static <T> Builder<ChangeEvent<String, String>> create(Class<T> format) {
        return StubEngine.builder();
    }
}
