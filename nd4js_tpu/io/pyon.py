"""PyON (Python object notation) parser, used by the .npy header.

Parity with /root/reference/src/io/pyon.js:20 — the reference parses
Python literals in JS; in Python the standard library's
``ast.literal_eval`` *is* that parser.
"""
from __future__ import annotations

import ast

__all__ = ["pyon_parse"]


def pyon_parse(text: str):
    return ast.literal_eval(text.strip())
