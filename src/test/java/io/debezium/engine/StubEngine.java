package io.debezium.engine;

import java.util.List;
import java.util.Properties;
import java.util.concurrent.CopyOnWriteArrayList;
import java.util.concurrent.CountDownLatch;
import java.util.function.Consumer;

/** In-memory engine behind the DebeziumEngine test stub: drains the
 * statically queued envelope values to the consumer (the real engine
 * tails a database log here), then parks until closed — mirroring the
 * run-until-closed lifecycle DebeziumRuntime manages. */
public final class StubEngine implements DebeziumEngine<ChangeEvent<String, String>> {
    public static final List<String> EVENTS = new CopyOnWriteArrayList<>();
    public static volatile Properties LAST_PROPS = null;

    private Consumer<ChangeEvent<String, String>> consumer;
    private final CountDownLatch closed = new CountDownLatch(1);

    static Builder<ChangeEvent<String, String>> builder() {
        final StubEngine e = new StubEngine();
        return new Builder<ChangeEvent<String, String>>() {
            public Builder<ChangeEvent<String, String>> using(Properties props) {
                LAST_PROPS = props;
                return this;
            }
            public Builder<ChangeEvent<String, String>> notifying(Consumer<ChangeEvent<String, String>> c) {
                e.consumer = c;
                return this;
            }
            public DebeziumEngine<ChangeEvent<String, String>> build() {
                return e;
            }
        };
    }

    @Override
    public void run() {
        for (final String v : EVENTS) {
            consumer.accept(new ChangeEvent<String, String>() {
                public String key() { return null; }
                public String value() { return v; }
            });
        }
        try {
            closed.await();
        } catch (InterruptedException ie) {
            Thread.currentThread().interrupt();
        }
    }

    @Override
    public void close() {
        closed.countDown();
    }
}
