"""Parameter census (ref ``count_parameters``, evaluation.py:26-40).

The reference prints a PrettyTable of named parameter counts at model
construction; prettytable isn't installed here, so the table is plain
text with the same content: one row per parameter, total at the bottom.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def format_table(headers, rows) -> str:
    """Plain-text PrettyTable-style box (prettytable isn't installed)."""
    cols = [[str(h)] + [str(r[i]) for r in rows]
            for i, h in enumerate(headers)]
    widths = [max(len(v) for v in col) for col in cols]
    sep = "+-" + "-+-".join("-" * w for w in widths) + "-+"
    def line(vals):
        return ("| " + " | ".join(str(v).ljust(w)
                                  for v, w in zip(vals, widths)) + " |")
    out = [sep, line(headers), sep]
    out += [line(r) for r in rows]
    out.append(sep)
    return "\n".join(out)


def count_parameters(params, printer=print) -> int:
    import jax
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(p.key) for p in path)
        n = int(np.prod(np.shape(leaf)))
        rows.append((name, n))
        total += n
    width = max((len(n) for n, _ in rows), default=7)
    printer(f"+-{'-' * width}-+------------+")
    printer(f"| {'Modules'.ljust(width)} | Parameters |")
    printer(f"+-{'-' * width}-+------------+")
    for name, n in rows:
        printer(f"| {name.ljust(width)} | {n:>10} |")
    printer(f"+-{'-' * width}-+------------+")
    printer(f"Total Trainable Params: {total}")
    return total
