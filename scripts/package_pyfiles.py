"""Build the spark-submit --py-files artifact (north rule packaging).

    python scripts/package_pyfiles.py [dist_dir]

Produces ``dist/file_deduplicator_spark.zip`` containing the package
sources only (no tests, no caches) with deterministic zip metadata
(fixed timestamps, sorted names) so repeated builds are byte-identical
and artifact hashes are meaningful in lineage records. Prints one JSON
line: {"zip": path, "files": n, "sha256": ..., "spark_submit": cmd}.
"""

from __future__ import annotations

import hashlib
import json
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "file_deduplicator_spark"

# zip epoch floor (1980-01-01): fixed so builds are reproducible
_FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build(dist_dir: Path | str | None = None) -> dict:
    dist = Path(dist_dir) if dist_dir else REPO / "dist"
    dist.mkdir(parents=True, exist_ok=True)
    out = dist / "file_deduplicator_spark.zip"

    members = sorted(
        p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in members:
            info = zipfile.ZipInfo(
                str(p.relative_to(REPO)), date_time=_FIXED_DATE
            )
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())

    digest = hashlib.sha256(out.read_bytes()).hexdigest()
    return {
        "zip": str(out),
        "files": len(members),
        "sha256": digest,
        "spark_submit": (
            f"spark-submit --py-files {out} {REPO / 'jobs' / 'run_dedup.py'}"
            " --input <table> --output <dir>"
        ),
    }


if __name__ == "__main__":
    print(json.dumps(build(sys.argv[1] if len(sys.argv) > 1 else None)))
