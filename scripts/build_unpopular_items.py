"""Write the unpopular-item set to JSON (reference
``data_utils/item_frequency.py`` CLI).

Usage: python scripts/build_unpopular_items.py -f events.csv -t out/ -q 0.9 -i item_id
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ikea_recommender_tpu.data.item_frequency import save_unpopular_items


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-f", "--filename", required=True)
    p.add_argument("-t", "--targetdir", required=True)
    p.add_argument("-q", "--quantile", type=float, default=0.9)
    p.add_argument("-i", "--item-col-name", default="item_id")
    args = p.parse_args()

    import pandas as pd

    if args.filename.endswith(".json") or args.filename.endswith(".jsonl"):
        df = pd.read_json(args.filename, orient="records", lines=True)
    elif args.filename.endswith(".csv"):
        df = pd.read_csv(args.filename)
    else:
        df = pd.read_pickle(args.filename)
    os.makedirs(args.targetdir, exist_ok=True)
    out = os.path.join(args.targetdir, "unpopular_items.json")
    save_unpopular_items(
        df[args.item_col_name].to_numpy(), out, quantile=args.quantile
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
