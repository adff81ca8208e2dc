"""Atomic artifact writes.

Round-11 postmortem: the end-of-round snapshot committed a 0-byte
``DRIVER_SIM_r11.json`` because the artifact was produced by shell
redirection (``python tools/driver_sim.py > FILE``) — the shell
truncates FILE at process start, so any snapshot taken before the
process finishes ships an empty file. Every artifact write now goes
through :func:`atomic_write` / :func:`atomic_write_json`: the content
is written to a same-directory temp file, fsynced, and ``os.rename``d
into place, so the destination path is only ever absent, the old
version, or the complete new version — never a partial write.
"""

from __future__ import annotations

import json
import os
import tempfile


def atomic_write(path: str, data: str) -> None:
    """Write ``data`` to ``path`` via temp-file + rename (atomic on POSIX)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(prefix=os.path.basename(path) + ".", dir=d)
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def atomic_write_json(path: str, obj, **dump_kwargs) -> None:
    dump_kwargs.setdefault("indent", 2)
    dump_kwargs.setdefault("default", str)
    atomic_write(path, json.dumps(obj, **dump_kwargs) + "\n")
