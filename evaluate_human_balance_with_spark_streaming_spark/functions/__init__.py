"""Scalar / array expression helpers.

All helpers return Column expressions built from pyspark.sql.functions
built-ins so they stay inside whole-stage codegen (the reference's own
function surface — unbase64/split/from_json/to_json, SURVEY §2.6 — is
pure built-ins too, and we keep that property for everything that can
be expressed without Python).
"""

from .text import (  # noqa: F401
    collapse_whitespace,
    fingerprint_md5,
    normalize_text,
    tokens,
    word_shingles,
)
from .hashing import md5_seeded, simhash32  # noqa: F401
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
