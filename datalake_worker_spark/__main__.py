"""``python -m datalake_worker_spark`` → the engine CLI."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
