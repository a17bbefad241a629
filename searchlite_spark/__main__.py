"""``python -m searchlite_spark`` — the CLI entry point
(the reference ships the same surface as the ``searchlite`` binary,
searchlite-cli/src/main.rs)."""

import sys

from searchlite_spark.cli import main

sys.exit(main())
