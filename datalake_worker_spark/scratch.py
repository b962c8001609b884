"""Session-scoped scratch directories with guaranteed cleanup.

Query builders stage table copies, streaming source feeds and
checkpoints under fresh temp dirs. A bare ``tempfile.mkdtemp`` leaks
them for the machine's lifetime — and with bench medians at 5 runs and
the driver re-invoking queries, one session can accumulate dozens of
orders/events copies (ADVICE r7). Every scratch dir instead registers
here and is removed at interpreter exit: the dirs only back lazy plans
whose SparkSession dies with the process, so exit-time removal is the
earliest universally-safe point (a returned DataFrame may re-read its
staged files on any later action).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A fresh temp directory, removed (recursively) at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
