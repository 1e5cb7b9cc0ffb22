"""Stall watchdog — failure-detection aid (SURVEY.md §5: the reference has
none; long-running TPU jobs want one).

Wrap device-bound phases so a hung transfer/compile/collective gets a loud
periodic warning (and optionally a hard abort) instead of a silent hang:

    wd = Watchdog(warn_after=120, abort_after=None)
    with wd.watch("gallery extraction"):
        feats = extract_features(...)
"""

import contextlib
import os
import threading
import time


class Watchdog:
    def __init__(self, warn_after=120.0, abort_after=None, log=print):
        self.warn_after = warn_after
        self.abort_after = abort_after
        self.log = log

    @contextlib.contextmanager
    def watch(self, name):
        done = threading.Event()
        start = time.monotonic()

        def monitor():
            warned = 0
            while not done.wait(self.warn_after):
                elapsed = time.monotonic() - start
                warned += 1
                self.log(
                    f"[watchdog] phase '{name}' running for {elapsed:.0f}s "
                    f"(warning #{warned}) — possible device/tunnel stall"
                )
                if self.abort_after and elapsed > self.abort_after:
                    self.log(
                        f"[watchdog] phase '{name}' exceeded abort_after="
                        f"{self.abort_after}s; aborting process"
                    )
                    os._exit(86)

        t = threading.Thread(target=monitor, daemon=True)
        t.start()
        try:
            yield
        finally:
            done.set()
