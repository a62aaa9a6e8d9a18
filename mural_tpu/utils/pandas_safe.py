"""Pin pandas to object-dtype strings (pre-3.0 semantics).

pandas 3.0 backs str columns/indexes with pyarrow string arrays by
default (``future.infer_string``).  Under this framework's threaded
epoch tails (calibration + Evaluator DataFrames built on a worker
thread while the main thread dispatches the next epoch) that machinery
corrupts the heap and segfaults inside
``pandas.core.arrays.string_arrow._from_sequence`` -- reliably
reproduced by running tests/test_parallel_extra.py standalone on this
image (pandas 3.0.3 / pyarrow 25.0.0), on every commit back to round
3, and gone with object-dtype strings.  A minimal two-thread
DataFrame-construction loop does NOT reproduce it, so the trigger is
some interaction with the rest of the process (JAX CPU compilation,
zero-copy buffers); object-dtype strings sidestep the arrow path
entirely and match the reference's pandas<2 era semantics
(ref environment.yml pins pandas 1.x; evaluation.py uses
DataFrame.append, removed in pandas 2).

Called from every pipeline entry point that may spawn worker threads
building DataFrames (train loop, ensemble runner, predict paths).
"""

from __future__ import annotations

_done = False


def ensure_object_strings() -> None:
    global _done
    if _done:
        return
    try:
        import pandas as pd
        pd.set_option("future.infer_string", False)
    except Exception:
        pass        # older pandas: already object-dtype
    _done = True
