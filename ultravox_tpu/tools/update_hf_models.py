"""Sync framework metadata into published HF model repos
(reference: tools/update_hf_models.py:1-147 keeps the ultravox_*.py source
files in published repos up to date).

The TPU build publishes plain config.json + safetensors (loadable by both
this framework and the reference's HF implementation), so the sync surface
is the config/processor/tokenizer metadata rather than model code.
"""

from __future__ import annotations

import argparse
import json
import tempfile
from typing import List


def update_repo(repo_id: str, files: List[str], dry_run: bool = False) -> None:
    from huggingface_hub import HfApi

    api = HfApi()
    if dry_run:
        print(f"would update {repo_id}: {files}")
        return
    for path in files:
        api.upload_file(
            path_or_fileobj=path,
            path_in_repo=path.split("/")[-1],
            repo_id=repo_id,
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repos", nargs="+", required=True)
    parser.add_argument("--files", nargs="+", required=True)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()
    for repo in args.repos:
        update_repo(repo, args.files, args.dry_run)


if __name__ == "__main__":
    main()
