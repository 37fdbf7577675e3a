"""Pickle IO + Lyapunov-artifact helpers.

``write_pickle``/``read_pickle`` mirror /root/reference/utils.py:227-239;
the Lyapunov helpers produce/consume the reference's
``lyapunov_results/*.pkl`` artifact layout: a dict keyed by class id whose
values are per-sample records
``[pred_class, true_class, confidence, true_class, lyapunov_exponent]``.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict
from typing import Any, Dict, List


def write_pickle(info: Any, filepath: str) -> None:
    head = os.path.split(filepath)[0]
    if head:
        os.makedirs(head, exist_ok=True)
    with open(filepath, "wb") as f:
        pickle.dump(info, f)


def read_pickle(filepath: str) -> Any:
    with open(filepath, "rb") as f:
        return pickle.load(f)


def save_lyapunov_records(records: Dict[int, List[list]],
                          filepath: str) -> None:
    out = defaultdict(list)
    for k, v in records.items():
        out[int(k)].extend(v)
    write_pickle(out, filepath)


def load_lyapunov_records(filepath: str) -> Dict[int, List[list]]:
    return dict(read_pickle(filepath))
