"""Key-value metrics logger.

Behavioral parity with baselines/logger.py: ``logkv`` last-wins (:311-313),
``logkv_mean`` running mean (:314-317), ``dumpkvs`` writes the accumulated row
to every configured format and clears it (:319-335), formats = human table /
json-lines / csv-with-dynamic-columns / tensorboard events
(logger.py:27-187), configuration via env vars with a timestamped tmpdir
default (logger.py:372-399), and per-process-suffix muting for non-zero
shards (logger.py:385-393).

Multi-host: when the program runs as several ``jax.distributed`` processes,
``dumpkvs`` computes the cross-process count-weighted mean
(``distributed.collectives.host_weighted_mean``) and only process 0 writes —
the logger.py:319-328 MPI contract with the comm replaced by the JAX process
group.
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import os.path as osp
import sys
import tempfile
import time
from collections import defaultdict
from contextlib import contextmanager

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


def _multiprocess() -> bool:
    """True when running as part of a jax.distributed process group (without
    importing jax for the common single-process case)."""
    if "jax" not in sys.modules:
        return False
    import jax

    try:
        return jax.process_count() > 1
    except RuntimeError:  # backend not initialized yet
        return False


# ---------------------------------------------------------------------------
# output formats


class KVWriter:
    def writekvs(self, kvs):
        raise NotImplementedError

    def close(self):
        pass


class SeqWriter:
    def writeseq(self, seq):
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    """Boxed two-column table (logger.py:27-74)."""

    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "wt")
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    @staticmethod
    def _cell(v):
        return f"{v:<8.3g}" if hasattr(v, "__float__") else str(v)

    def writekvs(self, kvs):
        cells = [
            (self._truncate(k), self._truncate(self._cell(v)))
            for k, v in sorted(kvs.items(), key=lambda kv: kv[0].lower())
        ]
        if not cells:
            return
        kw = max(len(k) for k, _ in cells)
        vw = max(len(v) for _, v in cells)
        rule = "-" * (kw + vw + 7)  # 7 = the "| " / " | " / " |" framing
        body = "".join(f"| {k.ljust(kw)} | {v.ljust(vw)} |\n" for k, v in cells)
        self.file.write(f"{rule}\n{body}{rule}\n")
        self.file.flush()

    @staticmethod
    def _truncate(s, maxlen=30):
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        self.file.write(" ".join(map(str, seq)) + "\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    """One JSON object per row (logger.py:77-91)."""

    def __init__(self, filename):
        self.file = open(filename, "wt")

    def writekvs(self, kvs):
        out = {}
        for k, v in sorted(kvs.items()):
            out[k] = float(v) if hasattr(v, "__float__") else v
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    """CSV with a grow-only column set (the progress.csv contract of
    logger.py:94-136: late-appearing metrics get a column, earlier rows get
    blanks).  When the header grows, the existing rows are re-read from the
    file (csv.DictReader) and re-emitted with the widened header — one
    rewrite per new metric, correct quoting for free, plain appends and
    O(1) memory at steady state (nothing cached for the life of a long
    run with frequent dumpkvs)."""

    def __init__(self, filename):
        self.filename = filename
        self.file = open(filename, "wt", newline="")
        self.keys: list[str] = []
        self.writer = None

    def writekvs(self, kvs):
        row = {k: ("" if v is None else v) for k, v in kvs.items()}
        fresh = sorted(set(row) - set(self.keys))
        if fresh:
            self.file.flush()
            with open(self.filename, "rt", newline="") as f:
                old_rows = list(csv.DictReader(f))
            self.keys += fresh
            self.file.close()
            self.file = open(self.filename, "wt", newline="")
            self.writer = csv.DictWriter(self.file, fieldnames=self.keys, restval="")
            self.writer.writeheader()
            self.writer.writerows(old_rows)
        self.writer.writerow(row)
        self.file.flush()

    def close(self):
        self.file.close()


class TensorBoardOutputFormat(KVWriter):
    """Scalar summaries via tensorboard's pure-python writer
    (logger.py:139-171 equivalent, without TF)."""

    def __init__(self, logdir):
        from torch.utils.tensorboard import SummaryWriter  # cpu torch is baked in

        os.makedirs(logdir, exist_ok=True)
        self.writer = SummaryWriter(log_dir=logdir)
        self.step = 1

    def writekvs(self, kvs):
        for k, v in kvs.items():
            if hasattr(v, "__float__"):
                self.writer.add_scalar(k, float(v), self.step)
        self.writer.flush()
        self.step += 1

    def close(self):
        self.writer.close()


def make_output_format(fmt, ev_dir, log_suffix=""):
    """Factory mirroring logger.py:174-187."""
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, f"log{log_suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format specified: {fmt}")


# ---------------------------------------------------------------------------
# logger singleton


class Logger:
    DEFAULT = None  # type: Logger
    CURRENT = None  # type: Logger

    def __init__(self, dir, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        if val is None:
            self.name2val[key] = None
            return
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + float(val) / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        if self.level == DISABLED and not _multiprocess():
            return {}
        d = dict(self.name2val)
        if _multiprocess():
            # cross-process count-weighted mean at dump time, only process 0
            # writes (logger.py:319-328 MPI contract).  Collective: every
            # process must call dumpkvs the same number of times, which the
            # uniform learn loops guarantee.
            import jax

            from baselines_tpu.distributed.collectives import host_weighted_mean

            d = host_weighted_mean(
                {k: (v, self.name2cnt.get(k, 1)) for k, v in d.items()}
            )
            if jax.process_index() != 0 or self.level == DISABLED:
                self.name2val.clear()
                self.name2cnt.clear()
                return d
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(d)
        self.name2val.clear()
        self.name2cnt.clear()
        return d

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, SeqWriter):
                    fmt.writeseq(map(str, args))

    def set_level(self, level):
        self.level = level

    def get_dir(self):
        return self.dir

    def close(self):
        for fmt in self.output_formats:
            fmt.close()


def _default_dir():
    return osp.join(
        tempfile.gettempdir(),
        datetime.datetime.now().strftime("btpu-%Y-%m-%d-%H-%M-%S-%f"),
    )


def configure(dir=None, format_strs=None, log_suffix=""):
    """logger.py:372-399 equivalent; env vars BTPU_LOGDIR / BTPU_LOG_FORMAT
    (OPENAI_LOGDIR / OPENAI_LOG_FORMAT honored as fallbacks)."""
    if dir is None:
        dir = os.getenv("BTPU_LOGDIR") or os.getenv("OPENAI_LOGDIR")
    if dir is None:
        dir = _default_dir()
    os.makedirs(dir, exist_ok=True)
    if format_strs is None:
        fmt_env = os.getenv("BTPU_LOG_FORMAT") or os.getenv("OPENAI_LOG_FORMAT")
        format_strs = fmt_env.split(",") if fmt_env else ["stdout", "log", "csv"]
    format_strs = [f for f in format_strs if f]
    output_formats = [make_output_format(f, dir, log_suffix) for f in format_strs]
    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    if output_formats:
        log(f"Logging to {dir}")


def configure_for_process(process_index: int, dir=None, format_strs=None):
    """Process 0 logs everything; others get a muted logger with a rank
    suffix (run.py:209-214 + logger.py:385-393 behavior)."""
    if process_index == 0:
        configure(dir=dir, format_strs=format_strs)
    else:
        # muted formats, NOT DISABLED: non-zero processes still participate
        # in the collective dumpkvs reduction (logger.py:385-393 keeps
        # rank-suffixed log files for the same reason)
        configure(dir=dir, format_strs=format_strs or ["log"], log_suffix=f"-proc{process_index:03d}")


def _get_current():
    if Logger.CURRENT is None:
        Logger.CURRENT = Logger(dir=None, output_formats=[HumanOutputFormat(sys.stdout)])
    return Logger.CURRENT


def logkv(key, val):
    _get_current().logkv(key, val)


def logkv_mean(key, val):
    _get_current().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def dumpkvs():
    return _get_current().dumpkvs()


def getkvs():
    return dict(_get_current().name2val)


def log(*args, level=INFO):
    _get_current().log(*args, level=level)


def debug(*args):
    log(*args, level=DEBUG)


def info(*args):
    log(*args, level=INFO)


def warn(*args):
    log(*args, level=WARN)


def error(*args):
    log(*args, level=ERROR)


def set_level(level):
    _get_current().set_level(level)


def get_dir():
    return _get_current().get_dir()


def reset():
    if Logger.CURRENT is not None:
        Logger.CURRENT.close()
    Logger.CURRENT = None


# ---------------------------------------------------------------------------
# wall-clock phase timers (logger.py:262-282 parity)

_profile_starts = {}


@contextmanager
def profile_kv(scopename):
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        _get_current().name2val[logkey] += time.time() - tstart


def profile(n):
    """Decorator form: @profile("name") accumulates wait_name."""

    def decorator_with_name(func):
        def func_wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)

        return func_wrapper

    return decorator_with_name
