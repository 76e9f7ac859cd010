"""Small IO utilities (reference ``project/*/utils.py``).

* :func:`download_if_missing` — pretrained-weight fetch
  (reference ``unconditional/utils.py:24-29`` via ``torch.hub``; plain urllib
  here, and a clear error in zero-egress environments);
* :func:`find_latest_file` — ctime-based checkpoint discovery
  (reference ``:15-22``) for directories of loose files (orbax dirs use
  ``train.checkpoint.find_latest_checkpoint``).
"""

from __future__ import annotations

import os
import urllib.request
from typing import Optional


def download_if_missing(path: str, url: str, timeout: float = 60.0) -> bool:
    """Fetch ``url`` to ``path`` unless it already exists. Returns True when
    the file is present afterwards."""
    if os.path.exists(path):
        return True
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        print(f"downloading {url} -> {path}")
        with urllib.request.urlopen(url, timeout=timeout) as r, open(path, "wb") as f:
            f.write(r.read())
        return True
    except Exception as exc:
        print(f"download failed ({exc}); provide the file manually at {path}")
        return False


def find_latest_file(directory: str, suffix: str = ".ckpt") -> Optional[str]:
    """Newest-by-ctime file with the given suffix (reference semantics)."""
    if not os.path.isdir(directory):
        return None
    candidates = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(suffix)
    ]
    return max(candidates, key=os.path.getctime) if candidates else None
