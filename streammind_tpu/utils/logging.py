"""Logging + metric utilities.

Replaces the reference's utils.build_logger (per-process rotating file logs,
/root/reference/streammind/utils.py:17-92) and misc.py's metric loggers
(SmoothedValue :182, MetricLogger :244).
"""
from __future__ import annotations

import datetime
import logging
import logging.handlers
import os
import sys
import time
from collections import defaultdict, deque
from typing import Dict, Optional

from ..constants import LOGDIR

_handler = None
_handlers: Dict[str, logging.Handler] = {}  # one rotating file PER filename


def build_logger(logger_name: str, logger_filename: str) -> logging.Logger:
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    root = logging.getLogger()
    if not root.handlers:
        logging.basicConfig(level=logging.INFO, format=formatter._fmt)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    # One rotating file handler PER requested filename: the old process-wide
    # singleton bound every later logger to whichever file was requested
    # FIRST (web_server importing controller sent all UI logs to
    # controller.log, and web_server.log was never created).
    if logger_filename not in _handlers:
        os.makedirs(LOGDIR, exist_ok=True)
        filename = os.path.join(LOGDIR, logger_filename)
        h = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True, encoding="utf-8"
        )
        h.setFormatter(formatter)
        _handlers[logger_filename] = h
        if _handler is None:
            # the FIRST file additionally captures every existing logger
            # (the reference's redirect-everything behavior, utils.py:17-92)
            _handler = h
            for name, item in logging.root.manager.loggerDict.items():
                if isinstance(item, logging.Logger):
                    item.addHandler(_handler)
    if _handlers[logger_filename] not in logger.handlers:
        logger.addHandler(_handlers[logger_filename])
    return logger


class SmoothedValue:
    """Windowed + global average tracker."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg
        )


class MetricLogger:
    """Iteration logger with throughput/ETA (reference misc.py:244-330)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())

    def log_every(self, iterable, print_freq: int, logger=None, header: str = ""):
        say = logger.info if logger else print
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        n = len(iterable) if hasattr(iterable, "__len__") else None
        end = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 and n:
                eta = datetime.timedelta(seconds=int(iter_time.global_avg * (n - i)))
                say(
                    f"{header} [{i}/{n}] eta: {eta} {self} "
                    f"time: {iter_time}"
                )
            end = time.time()
        total = time.time() - start
        say(f"{header} Total time: {datetime.timedelta(seconds=int(total))}")
