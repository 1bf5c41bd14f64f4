"""Download reference pretrained models from Google Drive
(reference: scripts/download_pretrained_models.py; convert the .pth files
afterwards with scripts/model_conversion/convert_torch_checkpoint.py).
Requires network access."""

import argparse
import os
import sys
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.utils.download_util import download_file_from_google_drive  # noqa: E402

FILE_IDS = {
    'ESRGAN': {
        'ESRGAN_SRx4_DF2KOST_official-ff704c30.pth': '1b3_bWZTjNO3iL2js1yWkJfjZykcQgvzT',
        'ESRGAN_PSNR_SRx4_DF2K_official-150ff491.pth': '1swaV5iBMFfg-DL6ZyiARztbhutDCWXMM',
    },
    'EDVR': {
        'EDVR_L_x4_SR_REDS_official-9f5f5039.pth': '127KXEjlCwfcGHsnsHvdSHPMHLEMCPGbq',
        'EDVR_L_x4_SR_Vimeo90K_official-162b54e4.pth': '1aVR5T5PDkJcBMWe3pV6OyHFyZLbMbaDP',
        'EDVR_M_x4_SR_REDS_official-32075921.pth': '1dd2_vm8hf1DJ2LqC5izo5SvZFTqnKL5H',
    },
    'StyleGAN': {
        'stylegan2_ffhq_config_f_1024_official-b09c3668.pth': '1oDBdNCtZKOLDRwIbcjTkMUDJxLDHMV_f',
    },
    'EDSR': {
        'EDSR_Mx4_f64b16_DIV2K_official-0c287733.pth': '1ijBFfGbxoBrzLADVcJLGkTvpuFzZei8y',
    },
    'DUF': {'DUF_x4_52L_official-483d2c78.pth': '1dKyYSjHbHsFSBPT3i9rE5HVSptT6S2Q7'},
    'TOF': {'tof_official-e81c455f.pth': '1BcNKBNWVvDvGHTo_prPgUYiZQFkNsjpZ'},
    'DFDNet': {'DFDNet_official-d1fa5650.pth': '1u6I4JpV8ZSHE9gbWnQUilKnsuAjPDSJC'},
    'BasicVSR': {'basicvsr_reds4.pth': '1NDAKVUdQS6tLUsgDGNdAcQnkDX1pbQ_i'},
    'flownet': {'spynet_sintel_final-3d2a1287.pth': '1vgsWbqJIMV0zMYbre6JP2p_U7uVXSBMm'},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('method', help=f"one of {sorted(FILE_IDS)} or 'all'")
    args = p.parse_args()
    methods = sorted(FILE_IDS) if args.method == 'all' else [args.method]
    for method in methods:
        root = f'./experiments/pretrained_models/{method}'
        os.makedirs(root, exist_ok=True)
        for file_name, file_id in FILE_IDS[method].items():
            save_path = osp.abspath(osp.join(root, file_name))
            if osp.exists(save_path):
                print(f'{file_name} already exists, skipping')
                continue
            print(f'Downloading {file_name} -> {save_path}')
            download_file_from_google_drive(file_id, save_path)


if __name__ == '__main__':
    main()
