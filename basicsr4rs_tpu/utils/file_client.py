"""Pluggable byte-store backends (reference: basicsr/utils/file_client.py:22-167).

Disk is the default; LMDB and memcached are import-gated since those client
libraries are optional in this environment.
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod
from typing import Any, Dict, Optional, Union


class BaseStorageBackend(metaclass=ABCMeta):

    @abstractmethod
    def get(self, filepath: str) -> bytes:
        ...

    def get_text(self, filepath: str) -> str:
        raise NotImplementedError


class HardDiskBackend(BaseStorageBackend):
    """Raw filesystem backend (reference file_client.py:58-71)."""

    def get(self, filepath: str) -> bytes:
        with open(str(filepath), 'rb') as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(str(filepath), 'r') as f:
            return f.read()


class LmdbBackend(BaseStorageBackend):
    """LMDB backend with one read-only env per db key
    (reference file_client.py:74-129)."""

    def __init__(self,
                 db_paths: Union[str, list],
                 client_keys: Union[str, list] = 'default',
                 readonly: bool = True,
                 lock: bool = False,
                 readahead: bool = False,
                 **kwargs):
        try:
            import lmdb
        except ImportError:
            raise ImportError('Please install lmdb to enable LmdbBackend.')
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, list):
            self.db_paths = [str(v) for v in db_paths]
        else:
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths), (
            'client_keys and db_paths should have the same length, '
            f'but received {len(client_keys)} and {len(self.db_paths)}.')
        self._client = {}
        for client, path in zip(client_keys, self.db_paths):
            self._client[client] = lmdb.open(path, readonly=readonly, lock=lock,
                                             readahead=readahead, **kwargs)

    def get(self, filepath: str, client_key: str = 'default') -> bytes:
        assert client_key in self._client, f'client_key {client_key} is not in lmdb clients.'
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(str(filepath).encode('ascii'))
        return value_buf


class MemcachedBackend(BaseStorageBackend):
    """Memcached backend (reference file_client.py:22-55); optional."""

    def __init__(self, server_list_cfg: str, client_cfg: str, sys_path: Optional[str] = None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError:
            raise ImportError('Please install memcached to enable MemcachedBackend.')
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg, client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath: str) -> bytes:
        import mc
        self._client.Get(str(filepath), self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)


class FileClient:
    """Facade dispatching to a named backend (reference file_client.py:132-167)."""

    _backends = {
        'disk': HardDiskBackend,
        'lmdb': LmdbBackend,
        'memcached': MemcachedBackend,
    }

    def __init__(self, backend: str = 'disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(f'Backend {backend} is not supported. '
                             f'Currently supported ones are {list(self._backends)}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = 'default') -> bytes:
        if self.backend == 'lmdb':
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath: str) -> str:
        return self.client.get_text(filepath)
