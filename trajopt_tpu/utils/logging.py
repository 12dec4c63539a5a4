"""Leveled logging gated by an environment variable.

Reference analog: the printf macro system with env override
``TRAJOPT_LOG_THRESH`` (trajopt_common/logging.hpp:10-28,
src/logging.cpp:17).  Here: ``TRAJOPT_TPU_LOG`` in
{FATAL, ERROR, WARN, INFO, DEBUG, TRACE}, default WARN.
"""

from __future__ import annotations

import os
import sys
import time

LEVELS = {"FATAL": 0, "ERROR": 1, "WARN": 2, "INFO": 3, "DEBUG": 4, "TRACE": 5}


def get_log_level() -> int:
    return LEVELS.get(os.environ.get("TRAJOPT_TPU_LOG", "WARN").upper(), 2)


def _log(level: str, msg: str, *args) -> None:
    if LEVELS[level] <= get_log_level():
        t = time.strftime("%H:%M:%S")
        print(f"[{t} {level}] {msg % args if args else msg}",
              file=sys.stderr if LEVELS[level] <= 1 else sys.stdout)


def log_fatal(msg, *args):
    _log("FATAL", msg, *args)


def log_error(msg, *args):
    _log("ERROR", msg, *args)


def log_warn(msg, *args):
    _log("WARN", msg, *args)


def log_info(msg, *args):
    _log("INFO", msg, *args)


def log_debug(msg, *args):
    _log("DEBUG", msg, *args)


def log_trace(msg, *args):
    _log("TRACE", msg, *args)
