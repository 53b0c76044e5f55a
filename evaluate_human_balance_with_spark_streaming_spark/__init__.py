"""PySpark-native analytics engine with the query and data-processing
capabilities of the STEDI balance-evaluation reference
(ahmed-gharib89/evaluate-human-balance-with-spark-streaming).

The reference is three PySpark Structured Streaming jobs (decode a
base64-wrapped Redis change feed, parse a risk-event JSON stream, and
stream-stream join the two onto a Kafka sink — see SURVEY.md). This
package re-derives those semantics as a clean, tested, general engine:

- ``session``    — SparkSession builder tuned for scale (AQE, Arrow, Kryo).
- ``schemas``    — the reference's declared StructTypes, quirks included.
- ``sources``    — kafka / parquet / json / memory sources behind one API.
- ``functions``  — scalar expression helpers (decode chain, text, vectors).
- ``operators``  — relational ops: dedup family, similarity search,
                   aggregates, multimodal column plumbing.
- ``plans``      — named query plans: STEDI parity pipelines + analytics.
- ``streaming``  — stream bindings: runner, sinks, watermarks, stateful.

Everything is expressed with the DataFrame / SQL API so Catalyst can
optimize (predicate pushdown, column pruning, broadcast joins, AQE);
Python UDFs appear only as Arrow-batched pandas UDFs where no built-in
composition exists.
"""

__version__ = "0.1.0"
