"""ScanNet data preparation CLI (reference ``data/scannet/prepare_data.py``).

    python scripts/prepare_data.py --split train \
        --scannet_path data/scannet/scans/ \
        --pointgroupinst_path PointGroupInst/ \
        --output_path data/scannet/pointgroup_data \
        --meta_path data/scannet/meta_data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instancerefer_tpu.data.prepare import batch_export


def main():
    parser = argparse.ArgumentParser("Data Preparation")
    parser.add_argument("--split", type=str, default="train",
                        choices=["train", "val", "test"])
    parser.add_argument("--scannet_path", type=str, default="data/scannet/scans/")
    parser.add_argument("--pointgroupinst_path", type=str, default="PointGroupInst/")
    parser.add_argument("--output_path", type=str, default="data/scannet/pointgroup_data")
    parser.add_argument("--meta_path", type=str, default="data/scannet/meta_data")
    args = parser.parse_args()
    batch_export(args.split, args.scannet_path, args.pointgroupinst_path,
                 args.output_path, args.meta_path)


if __name__ == "__main__":
    main()
