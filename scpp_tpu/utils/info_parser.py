"""Boost property-tree INFO-format config reader.

The reference framework loads every model/algorithm parameter from
``.info`` files through a property-tree parser
(reference: scpp_core/utils/include/parameterServer.hpp:34-128). We keep the
file format compatible so stock SCpp config files can be ingested verbatim,
while the primary configuration path of this framework is plain Python
dataclasses (see scpp_tpu/configs/).

Supported INFO subset (sufficient for all SCpp configs):
  - ``key value`` scalar pairs,
  - ``key`` followed by a ``{ ... }`` child block,
  - ``;`` comments to end of line,
  - vector blocks with ``(i) value`` entries, matrix blocks with
    ``(i,j) value`` entries, and an optional per-block ``scaling`` key
    (parameterServer.hpp:86,127: result is multiplied by ``scaling``),
  - quoted string values.

Matrix semantics match the reference loader: every element must be present
exactly once (missing/redundant entries raise, parameterServer.hpp:96-103).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_info", "InfoFile"]

_TOKEN_RE = re.compile(r'"[^"]*"|\{|\}|[^\s{}]+')


def _tokenize(text: str):
    tokens = []
    for raw_line in text.splitlines():
        # strip comments: ';' starts a comment outside quotes
        line = []
        in_quote = False
        for ch in raw_line:
            if ch == '"':
                in_quote = not in_quote
            if ch == ";" and not in_quote:
                break
            line.append(ch)
        tokens.extend(_TOKEN_RE.findall("".join(line)))
        tokens.append("\n")
    return tokens


def parse_info(text: str) -> dict:
    """Parse INFO text into a nested dict of {key: value-or-dict}."""
    tokens = _tokenize(text)
    pos = 0

    def parse_block(depth):
        nonlocal pos
        result = {}
        pending_key = None
        while pos < len(tokens):
            tok = tokens[pos]
            if tok == "\n":
                # a '{' on a following line still belongs to the pending key
                if pending_key is not None:
                    nxt = pos + 1
                    while nxt < len(tokens) and tokens[nxt] == "\n":
                        nxt += 1
                    if nxt >= len(tokens) or tokens[nxt] != "{":
                        result[pending_key] = ""
                        pending_key = None
                pos += 1
                continue
            if tok == "}":
                pos += 1
                if depth == 0:
                    raise ValueError("unbalanced '}' in INFO file")
                if pending_key is not None:
                    result[pending_key] = ""
                return result
            if tok == "{":
                pos += 1
                child = parse_block(depth + 1)
                if pending_key is None:
                    raise ValueError("child block without a key in INFO file")
                result[pending_key] = child
                pending_key = None
                continue
            # a plain token: either a key or a value for the pending key
            value = tok[1:-1] if tok.startswith('"') else tok
            pos += 1
            if pending_key is None:
                pending_key = value
            else:
                result[pending_key] = value
                pending_key = None
        if pending_key is not None:
            result[pending_key] = ""
        if depth != 0:
            raise ValueError("unbalanced '{' in INFO file")
        return result

    return parse_block(0)


_BOOL = {"true": True, "false": False, "1": True, "0": False,
         "on": True, "off": False, "yes": True, "no": False}


class InfoFile:
    """Typed accessors over a parsed INFO tree, mirroring ParameterServer.

    ``load_scalar``/``load_matrix`` follow parameterServer.hpp:64-128: scalars
    raise on missing keys; matrix blocks use ``(i)``/``(i,j)`` element keys,
    apply the optional ``scaling`` factor, and must be exactly populated.
    """

    def __init__(self, source: str, *, is_path: bool = True):
        if is_path:
            with open(source, "r") as f:
                text = f.read()
        else:
            text = source
        self.tree = parse_info(text)

    def has(self, name: str) -> bool:
        return name in self.tree

    def load_scalar(self, name: str, type_=float):
        if name not in self.tree:
            raise KeyError(f"Failed to load scalar: {name}")
        raw = self.tree[name]
        if isinstance(raw, dict):
            raise TypeError(f"{name} is a block, not a scalar")
        if type_ is bool:
            return _BOOL[str(raw).strip().lower()]
        return type_(raw)

    def load_vector(self, name: str, dim: int) -> np.ndarray:
        return self.load_matrix(name, (dim,))

    def load_matrix(self, name: str, shape) -> np.ndarray:
        if name not in self.tree:
            raise KeyError(f"Failed to load matrix: {name}")
        block = self.tree[name]
        if not isinstance(block, dict):
            raise TypeError(f"{name} is a scalar, not a block")
        scaling = float(block.get("scaling", 1.0))
        entries = {k: v for k, v in block.items() if k != "scaling"}
        out = np.zeros(shape, dtype=np.float64)
        if len(entries) < out.size:
            raise ValueError(f"Missing entries in matrix: {name}")
        if len(entries) > out.size:
            raise ValueError(f"Redundant entries in matrix: {name}")
        vector = len(shape) == 1
        for key, val in entries.items():
            m = re.fullmatch(r"\((\d+)(?:,(\d+))?\)", key)
            if not m:
                raise ValueError(f"Bad element key {key!r} in matrix {name}")
            i, j = int(m.group(1)), m.group(2)
            if vector:
                out[i] = float(val)
            else:
                out[i, 0 if j is None else int(j)] = float(val)
        return out * scaling
