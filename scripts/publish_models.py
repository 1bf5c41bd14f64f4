"""Stamp checkpoints with a short content hash for release
(reference: scripts/publish_models.py — sha256 over the file/dir, renamed to
`name-<8 hex>.ext`)."""

import argparse
import glob
import hashlib
import os
from os import path as osp


def hash_path(path):
    sha = hashlib.sha256()
    if osp.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for name in sorted(files):
                with open(osp.join(root, name), 'rb') as f:
                    sha.update(f.read())
    else:
        with open(path, 'rb') as f:
            sha.update(f.read())
    return sha.hexdigest()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pattern', help='glob of checkpoints to publish')
    args = p.parse_args()
    for path in sorted(glob.glob(args.pattern)):
        digest = hash_path(path)[:8]
        base, ext = osp.splitext(path.rstrip('/'))
        new_path = f'{base}-{digest}{ext}'
        os.rename(path, new_path)
        print(f'{path} -> {new_path}')


if __name__ == '__main__':
    main()
