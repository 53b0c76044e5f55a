"""Named query plans.

- ``stedi``     — reference-parity pipelines (decode chain, risk parse,
                  flagship join) as pure DataFrame->DataFrame functions
                  that run identically on batch and streaming inputs.
- ``analytics`` — the relational analytics surface (aggregations,
                  windows, sorts, multi-joins) exercised on the
                  synthetic star-schema test tables.
"""

from . import analytics, stedi  # noqa: F401
