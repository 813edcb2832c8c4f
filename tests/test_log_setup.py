"""Logging configuration tests (reference tests/test_log_setup.py)."""

import logging

from semanticlens_tpu.utils.log_setup import PACKAGE, ColorFormatter, setup_colored_logging


def test_null_handler_by_default():
    logger = logging.getLogger(PACKAGE)
    assert any(isinstance(h, logging.NullHandler) for h in logger.handlers)


def test_setup_attaches_stream_handler():
    setup_colored_logging("DEBUG")
    logger = logging.getLogger(PACKAGE)
    assert logger.level == logging.DEBUG
    assert any(isinstance(h, logging.StreamHandler) for h in logger.handlers)


def test_env_override(monkeypatch):
    monkeypatch.setenv("SEMANTICLENS_LOG_LEVEL", "WARNING")
    setup_colored_logging("DEBUG")
    assert logging.getLogger(PACKAGE).level == logging.WARNING


def test_file_handler(tmp_path):
    log_file = tmp_path / "out.log"
    setup_colored_logging("INFO", str(log_file))
    logger = logging.getLogger(PACKAGE)
    logger.info("hello file")
    for h in logger.handlers:
        h.flush()
    assert "hello file" in log_file.read_text()


def test_color_formatter_colors_tty_only():
    record = logging.LogRecord("x", logging.ERROR, __file__, 1, "boom", (), None)
    colored = ColorFormatter("%(message)s", use_color=True).format(record)
    plain = ColorFormatter("%(message)s", use_color=False).format(record)
    assert colored.startswith("\033[91m") and colored.endswith("\033[0m")
    assert plain == "boom"


def test_caplog_capture(caplog):
    setup_colored_logging("INFO")
    with caplog.at_level(logging.INFO, logger=PACKAGE):
        logging.getLogger(PACKAGE + ".sub").info("captured")
    assert "captured" in caplog.text
