"""Thin spark-submit launcher: the driver file stays outside the
--py-files zip (Spark requires the primary resource as a plain file).

    zip -r nil_spark.zip nil_spark
    spark-submit --py-files nil_spark.zip cli_main.py build \\
        --input /data/transcripts --index-dir /data/index
"""

import sys

from nil_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
