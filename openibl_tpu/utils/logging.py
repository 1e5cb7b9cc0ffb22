"""Stdout tee logger (process-0 only in multi-host runs).

Capability parity with /root/reference/ibl/utils/logging.py:8.
"""

import os
import sys


def mkdir_if_missing(path):
    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)


class Logger:
    """Tee stdout to a log file. Install with ``sys.stdout = Logger(path)``."""

    def __init__(self, fpath=None):
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            mkdir_if_missing(os.path.dirname(fpath))
            self.file = open(fpath, "w")

    def __del__(self):
        self.close()

    def write(self, msg):
        self.console.write(msg)
        if self.file is not None:
            self.file.write(msg)

    def flush(self):
        self.console.flush()
        if self.file is not None:
            self.file.flush()
            os.fsync(self.file.fileno())

    def close(self):
        if self.file is not None:
            self.file.close()
            self.file = None
