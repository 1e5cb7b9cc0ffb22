"""Tests for the stdout-mirroring log stream (utils/logging.py)."""

import io
import os.path as osp
import sys

from openibl_tpu.utils.logging import FanoutStream, Logger, tee_stdout


def test_fanout_writes_to_all_sinks():
    a, b = io.StringIO(), io.StringIO()
    s = FanoutStream([a], owned=[b])
    print("hello", file=s)
    s.flush()
    assert a.getvalue() == "hello\n" == b.getvalue()
    s.close()
    assert b.closed and not a.closed  # borrowed sinks survive close
    assert s.closed


def test_logger_creates_dirs_and_mirrors(tmp_path):
    path = str(tmp_path / "nested" / "dir" / "log.txt")
    console = io.StringIO()
    stream = Logger(path, console=console)
    stream.write("line1\n")
    stream.flush()
    assert console.getvalue() == "line1\n"
    assert open(path).read() == "line1\n"
    stream.close()
    stream.close()  # idempotent


def test_logger_without_path_is_console_only():
    console = io.StringIO()
    stream = Logger(console=console)
    stream.write("x")
    stream.flush()
    assert console.getvalue() == "x"


def test_tee_stdout_restores(tmp_path):
    path = str(tmp_path / "log.txt")
    before = sys.stdout
    with tee_stdout(path):
        assert sys.stdout is not before
        print("inside")
    assert sys.stdout is before
    assert "inside" in open(path).read()
    assert osp.isfile(path)
