"""Download helpers (reference: basicsr/utils/download_util.py:11-98).

This deployment image has no network egress; the functions are kept for API
parity and work when run in a connected environment.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from .misc import sizeof_fmt


def get_confirm_token(response):
    for key, value in response.cookies.items():
        if key.startswith('download_warning'):
            return value
    return None


def save_response_content(response, destination, file_size=None, chunk_size=32768):
    downloaded_size = 0
    readable_total = sizeof_fmt(file_size) if file_size is not None else '?'
    with open(destination, 'wb') as f:
        for chunk in response.iter_content(chunk_size):
            downloaded_size += chunk_size
            if file_size is not None:
                print(f'\rDownload {sizeof_fmt(downloaded_size)} / {readable_total}',
                      end='', flush=True)
            if chunk:
                f.write(chunk)
    if file_size is not None:
        print()


def download_file_from_google_drive(file_id, save_path):
    """Fetch a Google-Drive file by id, handling the confirm-token dance."""
    import requests
    session = requests.Session()
    url = 'https://docs.google.com/uc?export=download'
    params = {'id': file_id}
    response = session.get(url, params=params, stream=True)
    token = get_confirm_token(response)
    if token:
        params['confirm'] = token
        response = session.get(url, params=params, stream=True)
    probe = session.get(url, params=params, stream=True, headers={'Range': 'bytes=0-2'})
    file_size = (int(probe.headers['Content-Range'].split('/')[1])
                 if 'Content-Range' in probe.headers else None)
    save_response_content(response, save_path, file_size)


def load_file_from_url(url, model_dir=None, progress=True, file_name=None):
    """Download ``url`` into ``model_dir`` (or the torch hub cache) unless it
    is already cached; returns the local path."""
    if model_dir is None:
        from torch.hub import get_dir
        model_dir = os.path.join(get_dir(), 'checkpoints')
    os.makedirs(model_dir, exist_ok=True)
    filename = file_name or os.path.basename(urlparse(url).path)
    cached_file = os.path.abspath(os.path.join(model_dir, filename))
    if not os.path.exists(cached_file):
        from torch.hub import download_url_to_file
        print(f'Downloading: "{url}" to {cached_file}\n')
        download_url_to_file(url, cached_file, hash_prefix=None, progress=progress)
    return cached_file
