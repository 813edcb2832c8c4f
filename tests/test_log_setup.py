"""Logging configuration tests (observability contract of reference tests/test_log_setup.py)."""

import logging

from semanticlens_tpu.utils.log_setup import (
    PACKAGE,
    ColorFormatter,
    resolve_level,
    setup_colored_logging,
)


def test_null_handler_by_default():
    logger = logging.getLogger(PACKAGE)
    assert any(isinstance(h, logging.NullHandler) for h in logger.handlers)


def test_setup_attaches_stream_handler():
    logger = setup_colored_logging("DEBUG")
    assert logger is logging.getLogger(PACKAGE)
    assert logger.level == logging.DEBUG
    assert any(isinstance(h, logging.StreamHandler) for h in logger.handlers)


def test_repeated_setup_does_not_stack_handlers():
    setup_colored_logging("INFO")
    n_first = len(logging.getLogger(PACKAGE).handlers)
    setup_colored_logging("INFO")
    assert len(logging.getLogger(PACKAGE).handlers) == n_first


def test_env_override(monkeypatch):
    monkeypatch.setenv("SEMANTICLENS_LOG_LEVEL", "WARNING")
    setup_colored_logging("DEBUG")
    assert logging.getLogger(PACKAGE).level == logging.WARNING


def test_resolve_level_garbage_falls_back_to_info(monkeypatch):
    monkeypatch.setenv("SEMANTICLENS_LOG_LEVEL", "shouty")
    assert resolve_level("DEBUG") == logging.INFO


def test_file_handler(tmp_path):
    log_file = tmp_path / "out.log"
    logger = setup_colored_logging("INFO", str(log_file))
    logger.info("hello file")
    for h in logger.handlers:
        h.flush()
    text = log_file.read_text()
    assert "hello file" in text
    assert "\033[" not in text, "file sink must be color-free"


def test_color_formatter_styles_level_token_only():
    record = logging.LogRecord("x", logging.ERROR, __file__, 1, "boom", (), None)
    colored = ColorFormatter("%(levelname)s %(message)s", use_color=True).format(record)
    plain = ColorFormatter("%(levelname)s %(message)s", use_color=False).format(record)
    assert "\033[31mERROR\033[0m" in colored
    assert colored.endswith("boom"), "message text itself stays unstyled"
    assert plain == "ERROR boom"
    assert record.levelname == "ERROR", "record must be restored after formatting"


def test_no_color_env_disables_ansi(monkeypatch, tmp_path, capsys):
    monkeypatch.setenv("NO_COLOR", "1")
    monkeypatch.setenv("FORCE_COLOR", "1")  # NO_COLOR must win
    logger = setup_colored_logging("INFO")
    logger.warning("plain please")
    captured = capsys.readouterr()
    assert "\033[" not in captured.err + captured.out


def test_caplog_capture(caplog):
    setup_colored_logging("INFO")
    with caplog.at_level(logging.INFO, logger=PACKAGE):
        logging.getLogger(PACKAGE + ".sub").info("captured")
    assert "captured" in caplog.text
