"""Data sources behind one small API.

The reference reads only Kafka (``redis-server`` and ``stedi-events``
topics, reference sparkpykafkajoin.py:63-69/158-164). The engine
generalizes: the same pipeline binds to Kafka in production and to
parquet / json-file / memory / rate sources in tests, because every
pipeline is a pure DataFrame transformation (plans/).
"""

from .files import read_parquet, stream_json_dir, stream_parquet_dir  # noqa: F401
from .kafka import kafka_sink_options, read_kafka_stream  # noqa: F401
from .testdata import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    stedi_customers_wire,
    stedi_risk_wire,
)
