"""Dataset self-filtering: keep images the judge model predicts correctly.

Parity with ``TIC/utils/filter.py``: read a full_judge CSV, copy rows where
``predicted_class == actual_class`` into ``<out>/<label>/``; or run the judge
end-to-end first when ``--model`` is given. This is the pipeline stage that
produced ``data/data_filtered_vit_base`` (README recipe step 3).
"""
from __future__ import annotations

import csv
import os
import shutil


def copy_image(image_path: str, label: str, output_directory: str) -> None:
    new_path = os.path.join(output_directory, label, os.path.basename(image_path))
    os.makedirs(os.path.dirname(new_path), exist_ok=True)
    shutil.copy(image_path, new_path)


def filter(csv_file: str, output_directory: str) -> tuple[int, int]:
    """Copy correctly-predicted images; returns (total, copied)."""
    tot = cnt = 0
    with open(csv_file) as f:
        for row in csv.DictReader(f):
            tot += 1
            if row["predicted_class"].strip() == row["actual_class"].strip():
                cnt += 1
                copy_image(row["path"].strip(), row["actual_class"].strip(), output_directory)
    print(f"Tot:{tot}, Copy cnt:{cnt}, Rate:{cnt / tot if tot else 0.0}")
    return tot, cnt


def main(argv=None):
    import argparse

    from . import serve as serve_mod

    parser = argparse.ArgumentParser(description="Filter images by predictions")
    parser.add_argument("--csv-file", type=str, default=None)
    parser.add_argument("--output-directory", "-od", type=str, required=True)
    parser.add_argument("--model", type=str, default=None,
                        choices=["resnet", "vit-base", "vit-large"])
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--image", type=str, default=None, help="Data folder to filter")
    args = parser.parse_args(argv)

    if args.model:
        if not args.image:
            raise SystemExit("--image is required with --model")
        predictor = serve_mod.init(modelt=args.model, weights=args.weights,
                                   data_dir=args.image)
        output = args.csv_file or "filter_temp.csv"
        serve_mod.full_judge(predictor, args.image, output)
        filter(output, args.output_directory)
        if not args.csv_file:
            os.remove(output)
    elif args.csv_file:
        filter(args.csv_file, args.output_directory)
    else:
        raise SystemExit("Please provide either --model or --csv-file")


if __name__ == "__main__":
    main()
