"""``python -m docwire_spark`` — the reference's ``docwire`` CLI
(src/docwire.cpp) for single documents; see docwire_spark/cli.py."""

import sys

from docwire_spark.cli import main

sys.exit(main())
