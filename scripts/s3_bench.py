"""Fan-out bench over a LIVE object-store endpoint (loopback S3 server +
s3a ranged reads) — the deployment shape the reference benches
(README.md:74-92: MinIO endpoint, per-object queries, ranged-read
accounting). Produces the committed artifact S3RUN_r{N}.json with the
runner's report (client-side Hadoop FS statistics) plus the server's
request counters (HTTP-side truth).

    python scripts/s3_bench.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ocs_duckdb_runner_spark.runner import FanoutRunner, split_objects  # noqa: E402
from ocs_duckdb_runner_spark.session import S3Config, build_spark  # noqa: E402
from ocs_duckdb_runner_spark.sources.loopback_s3 import (  # noqa: E402
    ensure_jar,
    loopback_conf,
)
from ocs_duckdb_runner_spark.sources.s3_loopback_server import (  # noqa: E402
    S3LoopbackServer,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    jar = ensure_jar()

    # the server root is decided before the session so the endpoint (a
    # JVM-start classpath + conf concern) is known at build time; the
    # object split itself needs Spark, so stage it in the same session
    with S3LoopbackServer("/tmp/ocs_fanout_objects") as srv:
        spark = build_spark(
            app_name="ocs-s3-bench",
            s3=S3Config(
                endpoint=srv.endpoint,
                access_key_id="bench-access",
                secret_access_key="bench-secret",
            ),
            extra_conf={
                "spark.scheduler.mode": "FAIR",
                "spark.ui.enabled": "true",
                **loopback_conf(jar),
            },
        )
        objdir = split_objects(spark, sf_dir, 8)
        rel = Path(objdir).relative_to("/tmp/ocs_fanout_objects")
        names = sorted(
            p.name for p in Path(objdir).iterdir() if p.name.endswith(".parquet")
        )
        sources = [f"s3a://ocs/{rel}/{n}" for n in names]

        runner = FanoutRunner(spark, threads=4)
        cold = runner.run(sources)
        warm = runner.run(sources)
        stats = json.loads(
            urllib.request.urlopen(f"{srv.endpoint}/__stats__").read()
        )
        spark.stop()

    artifact = {
        "sf_dir": sf_dir,
        "transport": "s3a:// via LoopbackS3AFileSystem -> loopback HTTP "
        "object server (ranged GETs)",
        "sources": len(sources),
        "cold": {k: cold[k] for k in (
            "total_query_time_sec", "hits", "read_ops", "read_bytes")},
        "warm": {k: warm[k] for k in (
            "total_query_time_sec", "hits", "read_ops", "read_bytes")},
        "server": stats,
    }
    line = json.dumps(artifact)
    print(line)
    if out_path:
        Path(out_path).write_text(json.dumps(artifact, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
