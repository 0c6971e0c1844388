"""Large-scale data-pipeline operators (beyond the reference surface).

DataFrame → DataFrame, shuffle-partitioned, nothing collected to the
driver.  Two hash families are used deliberately:

- **MD5** (``F.md5``) where a DuckDB oracle must reproduce the result
  bit-for-bit (declared queries in ``swiftlake_spark.queries.llm``);
- **xxhash64** (``F.xxhash64``, JVM-side, ~10× faster) for the
  engine-internal fast paths here, which the driver checks rows-only.
"""

from swiftlake_spark.operators import (  # noqa: F401
    dedup,
    joins,
    multimodal,
    similarity,
    text,
)
