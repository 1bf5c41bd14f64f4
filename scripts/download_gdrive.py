"""Download a single Google-Drive file by id
(reference: scripts/download_gdrive.py)."""

import argparse
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.utils.download_util import download_file_from_google_drive  # noqa: E402

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--id', required=True, help='Google Drive file id')
    parser.add_argument('--output', required=True, help='save path')
    args = parser.parse_args()
    download_file_from_google_drive(args.id, args.output)
