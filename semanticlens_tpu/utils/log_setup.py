"""Logging configuration for the semanticlens_tpu package.

Provides opt-in colored console logging under the ``semanticlens_tpu``
logger hierarchy with a ``SEMANTICLENS_LOG_LEVEL`` environment override and a
NullHandler default, matching the observability contract of the reference
(semanticlens/utils/log_setup.py:35-93).
"""

from __future__ import annotations

import logging
import os

PACKAGE = "semanticlens_tpu"


class ColorFormatter(logging.Formatter):
    """Formatter that colorizes records by level for TTY streams."""

    COLOR_MAP = {
        "DEBUG": "\033[90m",
        "INFO": "\033[92m",
        "WARNING": "\033[38;5;208m",
        "ERROR": "\033[91m",
        "CRITICAL": "\033[91m",
    }
    RESET_SEQ = "\033[0m"

    def __init__(self, fmt, use_color: bool = True):
        super().__init__(fmt)
        self.use_color = use_color

    def format(self, record):
        record.short_filename = os.path.basename(record.pathname)
        message = super().format(record)
        if self.use_color:
            color = self.COLOR_MAP.get(record.levelname, "")
            return f"{color}{message}{self.RESET_SEQ}"
        return message


def setup_colored_logging(log_level: str = "INFO", file_path: str | None = None):
    """Attach a colored stream handler to the package logger.

    ``SEMANTICLENS_LOG_LEVEL`` overrides ``log_level``. When ``file_path`` is
    given, an uncolored file handler is added as well.
    """
    logger = logging.getLogger(PACKAGE)
    effective_level_str = os.environ.get("SEMANTICLENS_LOG_LEVEL", log_level).upper()
    effective_level = getattr(logging, effective_level_str, logging.INFO)
    logger.setLevel(effective_level)

    if logger.hasHandlers():
        logger.handlers.clear()
    handler = logging.StreamHandler()
    handler.setLevel(effective_level)
    use_color = hasattr(handler.stream, "isatty") and handler.stream.isatty()

    formatter = ColorFormatter(
        "[%(asctime)s|%(name)s|%(levelname)s]: %(message)s",
        use_color=use_color,
    )
    handler.setFormatter(formatter)
    logger.addHandler(handler)

    if file_path:
        file_handler = logging.FileHandler(file_path)
        file_handler.setLevel(effective_level)
        file_handler.setFormatter(
            ColorFormatter(
                "[%(asctime)s|%(name)s|%(levelname)s]: %(message)s",
                use_color=False,
            )
        )
        logger.addHandler(file_handler)


logging.getLogger(PACKAGE).addHandler(logging.NullHandler())
