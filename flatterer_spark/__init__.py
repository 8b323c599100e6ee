"""flatterer_spark — a PySpark-native analytics engine with the
capabilities of kindly/flatterer (JSON -> linked relational tables) plus a
full relational query surface and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Reference semantics: /root/reference (kindly/flatterer). Architecture is
Spark-first — logical plans declared via the DataFrame API, physical
execution left to Catalyst/Tungsten/AQE.
"""

from __future__ import annotations

__version__ = "0.1.0"

from flatterer_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark", "__version__"]
