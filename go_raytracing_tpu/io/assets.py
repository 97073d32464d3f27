"""Asset path resolution (FindAsset equivalent, rt/image_loader.go:122-145).

Searches the working directory, ``assets/<type>/``, parent directories, and
— unique to this build — the read-only reference checkout's asset tree, so
the real HDRI / earth-map data ships with parity tests without duplication.
"""

from __future__ import annotations

import os

REFERENCE_ASSETS = "/root/reference/assets"
_REPO_ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets")


def find_asset(filename: str, asset_type: str) -> str:
    base = os.path.basename(filename)
    candidates = [
        filename,
        os.path.join(asset_type, filename),
        os.path.join("assets", asset_type, filename),
        os.path.join("..", asset_type, filename),
        os.path.join("..", "assets", asset_type, filename),
        os.path.join(_REPO_ASSETS, asset_type, base),
        os.path.join(REFERENCE_ASSETS, asset_type, base),
    ]
    # The reference stores scene paths like "assets/hdri/foo.hdr"; also try
    # resolving just the basename under every root.
    if base != filename:
        candidates += [
            os.path.join("assets", asset_type, base),
            os.path.join(REFERENCE_ASSETS, asset_type, base),
        ]
    for path in candidates:
        if os.path.isfile(path):
            return path
    raise FileNotFoundError(
        f"asset '{filename}' (type {asset_type}) not found; searched {candidates}"
    )
