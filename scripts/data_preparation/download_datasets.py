"""Download benchmark datasets (Set5/Set14) from Google Drive and unzip
(reference: scripts/data_preparation/download_datasets.py). Requires
network access."""

import argparse
import glob
import os
import shutil
import sys
import zipfile
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))
from basicsr4rs_tpu.utils.download_util import download_file_from_google_drive  # noqa: E402

FILE_IDS = {
    'Set5': {'Set5.zip': '1RtyIeUFTyW8u7oa4z7a0lSzT3T1FwZE9'},
    'Set14': {'Set14.zip': '1vsw07sV8wGrRQ8UARe2fO5jjgy9QJy_E'},
}


def download_dataset(dataset, file_ids, overwrite=False):
    root = './datasets/'
    os.makedirs(root, exist_ok=True)
    for file_name, file_id in file_ids.items():
        save_path = osp.abspath(osp.join(root, file_name))
        if osp.exists(save_path) and not overwrite:
            print(f'{file_name} already exists, skipping (use --overwrite to refetch)')
        else:
            print(f'Downloading {file_name} to {save_path}')
            download_file_from_google_drive(file_id, save_path)
        if save_path.endswith('.zip'):
            extracted = save_path[:-4]
            print(f'Extract {save_path} -> {extracted}')
            with zipfile.ZipFile(save_path) as zf:
                zf.extractall(extracted)
            sub = osp.join(extracted, file_name[:-4])
            if osp.isdir(sub):
                for path in glob.glob(osp.join(sub, '*')):
                    shutil.move(path, extracted)
                shutil.rmtree(sub)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('dataset', help="'Set5', 'Set14' or 'all'")
    p.add_argument('--overwrite', action='store_true')
    args = p.parse_args()
    names = FILE_IDS if args.dataset == 'all' else [args.dataset]
    for name in names:
        download_dataset(name, FILE_IDS[name], args.overwrite)
