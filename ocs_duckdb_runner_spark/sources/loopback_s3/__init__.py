"""Build + config helpers for the loopback s3a FileSystem.

The sandbox ships pyspark's Hadoop client but not hadoop-aws/aws-sdk, so
`s3a://` URIs have no FileSystem implementation out of the box. This
package compiles LoopbackS3AFileSystem.java (a minimal read-only s3a FS
speaking HTTP ranged reads — see its header comment) against the bundled
hadoop-client-api jar and packages it as a jar for
`spark.driver.extraClassPath`. With real hadoop-aws jars present, none of
this is needed — the same S3Config maps straight onto S3AFileSystem.
"""

from __future__ import annotations

import subprocess
import zipfile
from pathlib import Path

_SRC = Path(__file__).parent / "LoopbackS3AFileSystem.java"
_BUILD = Path("/tmp/ocs_loopback_s3a")


def hadoop_aws_available() -> bool:
    """True when the real s3a connector's jars are on pyspark's classpath."""
    import pyspark

    jars = Path(pyspark.__file__).parent / "jars"
    return any(jars.glob("hadoop-aws-*.jar"))


def _hadoop_api_jar() -> Path:
    import pyspark

    jars = Path(pyspark.__file__).parent / "jars"
    matches = sorted(jars.glob("hadoop-client-api-*.jar"))
    if not matches:
        raise FileNotFoundError("hadoop-client-api jar not found in pyspark")
    return matches[0]


def ensure_jar() -> str:
    """Compile the loopback FS (cached by source mtime) and return the
    jar path. Raises if javac is unavailable."""
    jar = _BUILD / "loopback-s3a.jar"
    stamp = _BUILD / "src.mtime"
    mtime = str(_SRC.stat().st_mtime_ns)
    if jar.exists() and stamp.exists() and stamp.read_text() == mtime:
        return str(jar)
    classes = _BUILD / "classes"
    classes.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        [
            "javac",
            "-cp",
            str(_hadoop_api_jar()),
            "-d",
            str(classes),
            str(_SRC),
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    with zipfile.ZipFile(jar, "w") as zf:  # a jar is a zip
        for cls in sorted(classes.rglob("*.class")):
            zf.write(cls, cls.relative_to(classes))
    stamp.write_text(mtime)
    return str(jar)


def loopback_conf(jar: str) -> dict[str, str]:
    """extra_conf entries wiring s3a:// to the loopback FS. local[*] runs
    executors in the driver JVM, so driver extraClassPath covers both."""
    return {
        "spark.driver.extraClassPath": jar,
        "spark.hadoop.fs.s3a.impl": "org.ocsspark.LoopbackS3AFileSystem",
    }
