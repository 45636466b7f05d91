#!/usr/bin/env python
"""spark-submit launcher for the linking pipeline (north_rule:
`spark-submit --py-files` deployment).

    zip -r els.zip entity_linking_spark
    spark-submit --master <cluster-master> --py-files els.zip \
        run_pipeline.py --input <table> --checkpoint <dir> --output <dir>

spark-submit executes a script file (not a module), and
`entity_linking_spark/cli.py` uses package-relative imports — this shim
is the submittable file. All arguments pass through to `cli.main`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entity_linking_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
