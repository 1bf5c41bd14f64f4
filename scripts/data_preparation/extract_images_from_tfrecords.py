"""Extract images from CelebA/FFHQ tfrecords into a folder or LMDB
(reference: scripts/data_preparation/extract_images_from_tfrecords.py — that
version requires TensorFlow; this one parses the TFRecord wire format and the
``tf.train.Example`` protobuf by hand, so no TF dependency).

Example:
    python scripts/data_preparation/extract_images_from_tfrecords.py \
        --pattern 'datasets/ffhq/tfrecords/ffhq-r08-*.tfrecords' \
        --resolution_log2 8 --output datasets/ffhq_256 --save_type img
"""

import argparse
import glob
import os
import struct
import sys
from os import path as osp

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def iter_tfrecord(path):
    """Yield raw record bytes (TFRecord framing: u64 length, u32 crc, data, u32 crc)."""
    with open(path, 'rb') as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            length, = struct.unpack('<Q', header)
            f.read(4)  # length crc
            data = f.read(length)
            f.read(4)  # data crc
            yield data


def _read_varint(buf, pos):
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:        # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:      # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:      # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:      # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f'unsupported wire type {wire}')
        yield field, wire, val


def parse_example(record):
    """Parse a tf.train.Example into {name: bytes | [int] | [float]}."""
    features = {}
    for f1, _, v1 in _iter_fields(record):      # Example.features = 1
        if f1 != 1:
            continue
        for f2, _, entry in _iter_fields(v1):   # Features.feature map entries
            if f2 != 1:
                continue
            key, feature = None, None
            for fk, _, vk in _iter_fields(entry):
                if fk == 1:
                    key = vk.decode('utf-8')
                elif fk == 2:
                    feature = vk
            if key is None or feature is None:
                continue
            for ft, _, fv in _iter_fields(feature):
                if ft == 1:    # BytesList
                    values = [v for fb, _, v in _iter_fields(fv) if fb == 1]
                    features[key] = values[0] if len(values) == 1 else values
                elif ft == 3:  # Int64List (packed varints)
                    vals, pos = [], 0
                    for fi, wi, vi in _iter_fields(fv):
                        if wi == 0:
                            vals.append(vi)
                        elif wi == 2:  # packed
                            p = 0
                            while p < len(vi):
                                x, p = _read_varint(vi, p)
                                vals.append(x)
                    features[key] = vals
    return features


def main():
    from basicsr4rs_tpu.utils.lmdb_util import LmdbMaker

    p = argparse.ArgumentParser()
    p.add_argument('--pattern', required=True, help='tfrecords glob')
    p.add_argument('--resolution_log2', type=int, required=True)
    p.add_argument('--output', required=True)
    p.add_argument('--save_type', choices=['img', 'lmdb'], default='img')
    p.add_argument('--compress_level', type=int, default=1)
    args = p.parse_args()

    res = 2**args.resolution_log2
    if args.save_type == 'lmdb':
        maker = LmdbMaker(args.output if args.output.endswith('.lmdb')
                          else args.output + '.lmdb',
                          compress_level=args.compress_level)
    else:
        os.makedirs(args.output, exist_ok=True)

    idx = 0
    for record_file in sorted(glob.glob(args.pattern)):
        print('Processing record:', record_file, flush=True)
        for record in iter_tfrecord(record_file):
            ex = parse_example(record)
            shape = ex['shape']  # (c, h, w) in the StyleGAN tfrecords
            img = np.frombuffer(ex['data'], np.uint8).reshape(shape)
            img = img.transpose(1, 2, 0)[:, :, ::-1]  # CHW RGB -> HWC BGR
            if img.shape[0] != res:
                raise ValueError(f'record resolution {img.shape[0]} != {res}')
            key = f'{idx:08d}'
            if args.save_type == 'img':
                cv2.imwrite(osp.join(args.output, f'{key}.png'), img,
                            [cv2.IMWRITE_PNG_COMPRESSION, args.compress_level])
            else:
                _, img_byte = cv2.imencode('.png', img,
                                           [cv2.IMWRITE_PNG_COMPRESSION, args.compress_level])
                maker.put(img_byte, key, (*img.shape[:2], img.shape[2]))
            idx += 1
            if idx % 500 == 0:
                print(f'extracted {idx}', flush=True)
    if args.save_type == 'lmdb':
        maker.close()
    print(f'done: {idx} images')


if __name__ == '__main__':
    main()
