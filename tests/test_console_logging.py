"""Async logger + console layer (≡ common/log.cpp, common/console.cpp)."""

import io
import time

from tpullm.utils.console import Console
from tpullm.utils.logging import (
    LEVEL_DEBUG,
    LEVEL_ERROR,
    LEVEL_INFO,
    AsyncLog,
)


class _Tty(io.StringIO):
    def isatty(self):
        return True


def _drain(log):
    log.flush()
    time.sleep(0.05)


def test_log_verbosity_gates_levels():
    out = io.StringIO()
    log = AsyncLog(stream=out)
    log.set_verbosity(LEVEL_ERROR)
    log.add(LEVEL_INFO, "hidden")
    log.add(LEVEL_DEBUG, "hidden too")
    log.add(LEVEL_ERROR, "shown")
    _drain(log)
    assert "shown" in out.getvalue()
    assert "hidden" not in out.getvalue()


def test_log_colors_and_prefix_on_tty():
    out = _Tty()
    log = AsyncLog(stream=out)
    log.set_colors(True)
    log.set_prefix(True)
    log.add(LEVEL_ERROR, "boom")
    _drain(log)
    s = out.getvalue()
    assert "\033[31m" in s and "E boom" in s and "\033[0m" in s


def test_log_pause_resume():
    out = io.StringIO()
    log = AsyncLog(stream=out)
    log.pause()
    log.add(LEVEL_INFO, "queued")
    time.sleep(0.05)
    assert "queued" not in out.getvalue()
    log.resume()
    _drain(log)
    assert "queued" in out.getvalue()


def test_log_timestamps():
    out = io.StringIO()
    log = AsyncLog(stream=out)
    log.set_timestamps(True)
    log.add(LEVEL_INFO, "stamped")
    _drain(log)
    line = out.getvalue()
    assert "stamped" in line
    head = line.split("stamped")[0].strip()
    float(head)  # leading monotonic timestamp


def test_console_utf8_split_codepoint():
    out = io.StringIO()
    con = Console(stream=out, use_color=False)
    euro = "€".encode()  # 3 bytes
    con.put(euro[:1])
    assert out.getvalue() == ""  # partial byte buffered, not emitted
    con.put(euro[1:])
    assert out.getvalue() == "€"
    con.put("ok")
    con.flush_partial()
    assert out.getvalue() == "€ok"


def test_console_flush_partial_replaces_garbage():
    out = io.StringIO()
    con = Console(stream=out, use_color=False)
    con.put(b"\xe2\x82")  # dangling partial sequence
    con.flush_partial()
    assert "�" in out.getvalue()


def test_console_display_colors():
    out = _Tty()
    con = Console(stream=out)
    con.set_display("prompt")
    con.put("hi")
    con.cleanup()
    s = out.getvalue()
    assert "\033[33m" in s and s.endswith("\033[0m")


def test_console_no_color_on_pipe():
    out = io.StringIO()
    con = Console(stream=out)  # StringIO.isatty() is False
    con.set_display("error")
    con.put("plain")
    con.cleanup()
    assert out.getvalue() == "plain"
