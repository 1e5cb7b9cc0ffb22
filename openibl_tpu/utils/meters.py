"""Scalar running-average meters for wall-clock / loss reporting.

Capability parity with the reference's meters (/root/reference/ibl/utils/meters.py:4).
"""


class AverageMeter:
    """Tracks current value, running sum, count and average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
