"""LMDB reader tests: format golden-offsets, roundtrips, tree shapes.

The fixture writer (tests/lmdb_fixture.py) emits the public LMDB on-disk
format; the golden-offset test pins both sides to that spec (magic/version/
meta layout at fixed byte positions) so writer and reader can't drift into
a private dialect together.
"""
import os
import struct

import numpy as np
import pytest

from diffpure_tpu.data.lmdb_reader import LMDBReader, LMDBFormatError
from tests.lmdb_fixture import write_lmdb, PSIZE


def _env(tmp_path, entries, name="env"):
    return write_lmdb(str(tmp_path / name), entries)


class TestFormatGoldens:
    def test_meta_page_spec_offsets(self, tmp_path):
        """Spec constants at spec offsets — independent of our reader."""
        path = _env(tmp_path, {b"k": b"v"})
        raw = open(os.path.join(path, "data.mdb"), "rb").read()
        for meta_off in (0, PSIZE):
            assert struct.unpack_from("<H", raw, meta_off + 10)[0] & 0x08
            magic, version = struct.unpack_from("<II", raw, meta_off + 16)
            assert magic == 0xBEEFC0DE
            assert version == 1
        # psize in FREE_DBI.md_pad (meta+40 relative to the page)
        assert struct.unpack_from("<I", raw, 40)[0] == PSIZE
        # newest meta (page 1) txnid=1 beats page 0's txnid=0
        assert struct.unpack_from("<Q", raw, PSIZE + 16 + 24 + 96 + 8)[0] == 1
        assert struct.unpack_from("<Q", raw, 16 + 24 + 96 + 8)[0] == 0

    def test_newest_meta_wins(self, tmp_path):
        """Meta 0 describes an empty tree; reader must pick meta 1."""
        path = _env(tmp_path, {b"a": b"1", b"b": b"2"})
        with LMDBReader(path) as r:
            assert len(r) == 2
            assert r.get(b"a") == b"1"

    def test_bad_magic_rejected(self, tmp_path):
        path = _env(tmp_path, {b"k": b"v"})
        fn = os.path.join(path, "data.mdb")
        raw = bytearray(open(fn, "rb").read())
        struct.pack_into("<I", raw, 16, 0xDEADBEEF)
        struct.pack_into("<I", raw, PSIZE + 16, 0xDEADBEEF)
        open(fn, "wb").write(bytes(raw))
        with pytest.raises(LMDBFormatError):
            LMDBReader(path)


class TestRoundtrip:
    def test_small_values(self, tmp_path):
        entries = {f"key{i:03d}".encode(): f"value-{i}".encode()
                   for i in range(50)}
        with LMDBReader(_env(tmp_path, entries)) as r:
            assert len(r) == 50
            for k, v in entries.items():
                assert r.get(k) == v
            assert r.get(b"missing") is None
            assert r.get(b"missing", b"dflt") == b"dflt"
            assert b"key007" in r and b"nope" not in r

    def test_overflow_values(self, tmp_path):
        """Image-sized values span overflow pages (the reference stores raw
        JPEG bytes, ref datasets.py:296-298)."""
        rng = np.random.RandomState(0)
        entries = {f"img/{i}.jpg".encode():
                   rng.bytes(int(PSIZE * s)) for i, s in
                   enumerate([0.5, 1.0, 2.7, 10.3])}
        with LMDBReader(_env(tmp_path, entries)) as r:
            for k, v in entries.items():
                got = r[k]
                assert len(got) == len(v)
                assert got == v

    def test_multilevel_tree(self, tmp_path):
        """Enough keys to force branch pages (and verify depth > 1)."""
        entries = {f"{i:06d}".encode(): (f"payload-{i}" * 20).encode()
                   for i in range(2000)}
        with LMDBReader(_env(tmp_path, entries)) as r:
            assert r.stat()["depth"] > 1
            assert len(r) == 2000
            for i in (0, 1, 999, 1998, 1999):
                k = f"{i:06d}".encode()
                assert r.get(k) == entries[k]
            assert r.get(b"999999") is None
            assert r.get(b"") is None

    def test_iteration_sorted(self, tmp_path):
        keys = [os.urandom(np.random.RandomState(i).randint(1, 30))
                for i in range(300)]
        entries = {k: k[::-1] for k in keys}
        with LMDBReader(_env(tmp_path, entries)) as r:
            out = list(r.items())
            assert [k for k, _ in out] == sorted(set(keys))
            assert all(v == k[::-1] for k, v in out)

    def test_empty_env(self, tmp_path):
        with LMDBReader(_env(tmp_path, {})) as r:
            assert len(r) == 0
            assert r.get(b"x") is None
            assert list(r.items()) == []

    def test_getitem_keyerror(self, tmp_path):
        with LMDBReader(_env(tmp_path, {b"a": b"1"})) as r:
            with pytest.raises(KeyError):
                r[b"zz"]

    def test_open_data_file_directly(self, tmp_path):
        path = _env(tmp_path, {b"a": b"1"})
        with LMDBReader(os.path.join(path, "data.mdb")) as r:
            assert r.get(b"a") == b"1"


class TestImagenetLmdbProtocol:
    def test_path_keyed_bytes(self, tmp_path):
        """The reference access pattern: txn.get(path.encode('ascii')) ->
        raw image bytes (ref datasets.py:261-265)."""
        img_bytes = bytes(range(256)) * 300           # ~77KB fake JPEG
        path_key = "/data/imagenet/val/n01440764/ILSVRC2012_val_1.JPEG"
        env = _env(tmp_path, {path_key.encode("ascii"): img_bytes})
        with LMDBReader(env) as r:
            assert r.get(path_key.encode("ascii")) == img_bytes


class TestImagenetLmdbLoader:
    def test_lmdb_val_subset_end_to_end(self, tmp_path):
        """Build an LMDB cache of a 3-class fake val folder, load a subset:
        classes must come from directory rank, pixels from the cached bytes,
        and the folder/lmdb loaders must agree sample-for-sample."""
        import io
        from PIL import Image
        from diffpure_tpu.data.datasets import (
            imagenet_lmdb_val_subset, imagenet_val_subset)

        rng = np.random.RandomState(0)
        val = tmp_path / "val"
        entries = {}
        for ci, cls in enumerate(["n01440764", "n01698640", "n02002556"]):
            (val / cls).mkdir(parents=True)
            for j in range(4):
                arr = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
                p = val / cls / f"img_{j}.png"
                Image.fromarray(arr).save(p)
                entries[str(p).encode("ascii")] = p.read_bytes()
        env = write_lmdb(str(tmp_path / "val_faster_imagefolder.lmdb"),
                         entries)

        x, y = imagenet_lmdb_val_subset(env, num_sub=6, data_seed=0,
                                        base_size=32)
        assert x.shape == (6, 32, 32, 3) and x.min() >= 0 and x.max() <= 1
        assert set(np.asarray(y)) <= {0, 1, 2}

        xf, yf = imagenet_val_subset(str(val), num_sub=6, data_seed=0,
                                     base_size=32)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yf))
        np.testing.assert_allclose(x, xf, atol=1e-6)
