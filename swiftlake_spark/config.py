"""Engine configuration.

Mirrors the performance-relevant knobs of the reference engine
(``SwiftLakeEngine.java:144-185``, ``BaseDataFileWriter.java:69-93`` — see
SURVEY.md §6) translated to Spark terms.  The reference sizes DuckDB to 90%
of RAM and all cores; on Spark those map to driver/executor memory and task
slots, which the session factory applies.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _default_cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 4


def _detected_memory_bytes() -> int | None:
    """Best-effort host/container memory limit: min of physical RAM and
    any cgroup (v2 then v1) hard cap."""
    cands: list[int] = []
    try:
        cands.append(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError, AttributeError):
        pass
    for path in ("/sys/fs/cgroup/memory.max",
                 "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            with open(path) as f:
                raw = f.read().strip()
            if raw.isdigit():
                v = int(raw)
                if v < 1 << 50:  # "max" / effectively-unlimited sentinels
                    cands.append(v)
        except OSError:
            continue
    return min(cands) if cands else None


def _default_driver_memory() -> str:
    """8g when the host can afford it, else ~half of the detected limit.

    local[N] runs driver AND all executor threads in ONE JVM heap;
    Spark's 1g default OOMs broadcast-hash builds once a few frames are
    persisted (observed at 50k docs + 20k vectors in the skew stress), so
    the default must be generous — but an unconditional 8g fails at JVM
    launch on hosts whose hard memory limit is below heap + overhead.
    Override via ``EngineConfig(driver_memory=...)`` either way."""
    total = _detected_memory_bytes()
    if total is None:
        return "8g"
    half_mib = total // (2 * 1024 * 1024)
    return "%dm" % min(8192, max(512, half_mib))


@dataclass
class EngineConfig:
    """Tunables for a SwiftLakeEngine session.

    Defaults track the reference's published defaults (BASELINE.md §2)
    where a Spark equivalent exists:

    - parquet compression ZSTD  (reference ``write.parquet.compression-codec``)
    - row-group size 122_880 rows (reference ``write.parquet.row-group-size``)
    - target data-file size 512 MiB (Iceberg default the reference inherits)
    - all cores, shuffle partitions = cores (reference ``threads`` = all cores)
    """

    app_name: str = "swiftlake-spark"
    master: str | None = None            # default: local[cpus]
    cpus: int = field(default_factory=_default_cpus)
    shuffle_partitions: int | None = None  # default: = cpus in local mode
    # see _default_driver_memory: 8g clamped to ~half the detected
    # host/cgroup memory limit so constrained containers still launch;
    # cluster deployments override per executor as usual
    driver_memory: str | None = field(default_factory=_default_driver_memory)
    session_timezone: str = "UTC"          # reference pins UTC (SwiftLakeEngine.java:426)
    adaptive: bool = True
    arrow: bool = True
    broadcast_threshold: str = "64m"       # small-dim joins broadcast aggressively
    max_partition_bytes: str = "128m"      # split large files into tasks
    # Relation-build file listing: Spark's default parallelism (10_000)
    # schedules one near-empty task per path once a scan exceeds the
    # discovery threshold, so a 2,000-file manifest costs ~2.8 s of pure
    # scheduling PER VIEW REGISTRATION (measured, scripts/
    # planning_stress.py).  Bounding it batches paths per task: 2,000
    # files list in 0.47 s, and at object-store scale (400k files) 256
    # tasks of ~1,500 batched stats beat 10k task launches.
    listing_parallelism: int = 256

    # write-path defaults (reference BaseDataFileWriter.java:69-93)
    parquet_compression: str = "zstd"
    row_group_size: int = 122_880
    target_file_size_bytes: int = 512 * 1024 * 1024

    # engine guards (reference IcebergScanExecutor.java:264-275,433-439)
    allow_full_table_scan: bool = True
    total_scan_size_limit_mib: int | None = None

    # query ergonomics (reference SwiftLakeEngine.java:626-672: statement
    # timeout + connection semaphore)
    query_timeout_s: float | None = None      # None = no timeout
    max_concurrent_queries: int | None = None  # None = unbounded
    query_acquire_timeout_s: float = 30.0      # wait for a slot before failing

    # SQL-transform hooks (reference sql/QueryTransformer.java:23, wired
    # in SwiftLakeConnection.prepareStatement:119-137): callables
    # ``str -> str`` applied IN ORDER to every statement entering
    # ``engine.sql()`` before DDL/DML routing and table resolution.
    # Parameter markers (:name / ?) pass through untouched unless a
    # transformer rewrites them deliberately.  A per-call ``transform=``
    # on engine.sql() runs first (the reference's statement-scoped form).
    sql_transformers: list = field(default_factory=list)

    extra_conf: dict[str, str] = field(default_factory=dict)

    @property
    def effective_master(self) -> str:
        return self.master or f"local[{self.cpus}]"

    @property
    def effective_shuffle_partitions(self) -> int:
        return self.shuffle_partitions or self.cpus
