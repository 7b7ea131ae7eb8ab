#!/usr/bin/env python
"""Build dist/drs_spark.zip for ``spark-submit --py-files``."""
import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "document_retrieval_system_spark"


def main() -> None:
    os.makedirs(os.path.join(HERE, "dist"), exist_ok=True)
    out = os.path.join(HERE, "dist", "drs_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(HERE, PKG)):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, HERE))
    print(out)


if __name__ == "__main__":
    main()
