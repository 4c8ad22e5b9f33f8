"""Minimal stand-in for the `colorlog` package (not installed in this image).

Only what `sample_factory/utils/utils.py` imports: ColoredFormatter.
Used exclusively by tools/probe_reference_halfcheetah.py to import the
read-only reference implementation for A/B probes.
"""

import logging


class ColoredFormatter(logging.Formatter):
    def __init__(self, fmt=None, datefmt=None, style="%", log_colors=None, **kwargs):
        if fmt:
            # strip color placeholders like %(log_color)s ... %(reset)s
            fmt = fmt.replace("%(log_color)s", "").replace("%(reset)s", "")
        super().__init__(fmt=fmt, datefmt=datefmt, style=style)
