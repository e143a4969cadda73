"""Reusable column-expression functions (all JVM-side built-ins).

Thin, dependency-free building blocks shared by operators and the
driver query bank; every function returns a Column and composes inside
whole-stage codegen.
"""

from .text import bpe_ish_tokens, lang_scores, normalized_fingerprint, stopword_ratio, ws_tokens  # noqa: F401
from .hashing import content_sha256, partition_fingerprint_expr  # noqa: F401
