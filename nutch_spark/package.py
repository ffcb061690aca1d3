"""spark-submit packaging — build the --py-files archive.

The north rule's launch shape is
``spark-submit --py-files nutch_spark.zip -m nutch_spark.crawl …`` on a
multi-executor cluster; this helper builds that archive from the
installed package so executors' python workers can import every
module (the local-cluster bench already proves the executor-side
import path via spark.executorEnv.PYTHONPATH — the zip is the
cluster-deploy equivalent).

Usage:
    python -m nutch_spark.package --out nutch_spark.zip
or from code: ``make_pyfiles_zip("/tmp/nutch_spark.zip")``.
"""

from __future__ import annotations

import os
import zipfile


def make_pyfiles_zip(out_path: str) -> str:
    """Zip the nutch_spark package (sources only, deterministic order)
    for spark-submit --py-files / SparkContext.addPyFile."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                arc = os.path.relpath(full, parent)
                zf.write(full, arc)
    return out_path


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="build --py-files archive")
    ap.add_argument("--out", default="nutch_spark.zip")
    args = ap.parse_args(argv)
    path = make_pyfiles_zip(args.out)
    print(path)


if __name__ == "__main__":
    main()
