#!/usr/bin/env python3
"""Wipe persisted state: index checkpoint, uploads, runtime config, job log.

Parity target: reference ``scripts/reset_system.py``. Asks for confirmation
unless --yes.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automative_rag_tpu.config.settings import settings  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--yes", action="store_true", help="skip confirmation")
    args = parser.parse_args()

    targets = [settings.index_dir, settings.upload_dir, settings.media_cache_dir]
    existing = [t for t in targets if Path(t).exists()]
    if not existing:
        print("nothing to reset")
        return
    print("will delete:", *existing, sep="\n  ")
    if not args.yes:
        if input("type 'reset' to confirm: ").strip() != "reset":
            print("aborted")
            return
    for target in existing:
        shutil.rmtree(target, ignore_errors=True)
        print(f"removed {target}")


if __name__ == "__main__":
    main()
