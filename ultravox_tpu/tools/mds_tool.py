"""HF → MosaicML-MDS conversion (reference: tools/mds_tool.py).

Converts an HF dataset into MDS shards for high-throughput streaming from
GCS. Requires ``mosaicml-streaming`` (not bundled); the CLI fails with a
clear message when it's absent.
"""

from __future__ import annotations

import argparse
import io
import json


def convert_to_mds(
    dataset, out_dir: str, audio_column: str = "audio", compression: str = "zstd"
) -> str:
    try:
        from streaming import MDSWriter
    except ImportError as e:
        raise ImportError(
            "mosaicml-streaming is required for MDS conversion: "
            "pip install mosaicml-streaming"
        ) from e

    import numpy as np

    columns = {}
    first = dataset[0]
    for key, value in first.items():
        if key == audio_column:
            columns[key] = "bytes"
        elif isinstance(value, str):
            columns[key] = "str"
        else:
            columns[key] = "json"

    with MDSWriter(out=out_dir, columns=columns, compression=compression) as w:
        for row in dataset:
            out = {}
            for key, value in row.items():
                if key == audio_column and isinstance(value, dict):
                    arr = np.asarray(value["array"], dtype=np.float32)
                    buf = io.BytesIO()
                    np.save(buf, arr)
                    out[key] = buf.getvalue()
                elif isinstance(value, str):
                    out[key] = value
                else:
                    out[key] = json.dumps(value)
            w.write(out)
    return out_dir


def main():
    import datasets as hf_datasets

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--subset", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", required=True, help="local dir or gs:// url")
    parser.add_argument("--audio_column", default="audio")
    args = parser.parse_args()
    ds = hf_datasets.load_dataset(args.dataset, args.subset, split=args.split)
    print(convert_to_mds(ds, args.out, args.audio_column))


if __name__ == "__main__":
    main()
