"""Packed dataset (.fpk) + native parallel reader tests."""

import numpy as np
import pytest

from fish_diffusion_tpu.datasets import (
    DataLoader,
    PackedDataset,
    PackedReader,
    pack_dataset,
)
from fish_diffusion_tpu.datasets.datapack import pack_samples


def _make_npy_dir(tmp_path, n=6, frames=40):
    rng = np.random.default_rng(0)
    d = tmp_path / "train"
    d.mkdir()
    for i in range(n):
        t = frames + i  # varying lengths
        sample = dict(
            path=f"sample_{i}.wav",
            time_stretch=1.0,
            key_shift=0.0,
            mel=rng.standard_normal((128, t)).astype(np.float32),
            contents=rng.standard_normal((256, t)).astype(np.float32),
            pitches=rng.uniform(80, 400, t).astype(np.float32),
        )
        np.save(d / f"{i:02d}.npy", sample, allow_pickle=True)
    return d


class TestPackRoundtrip:
    def test_exact_roundtrip(self, tmp_path):
        d = _make_npy_dir(tmp_path)
        out = tmp_path / "train.fpk"
        n = pack_dataset(d, out)
        assert n == 6

        reader = PackedReader(out)
        assert len(reader) == 6
        for i, p in enumerate(sorted(d.glob("*.npy"))):
            ref = np.load(p, allow_pickle=True).item()
            got = reader.read(i)
            for k, v in ref.items():
                if isinstance(v, np.ndarray):
                    np.testing.assert_array_equal(got[k], v)
                else:
                    assert got[k] == v
        reader.close()

    def test_batch_read_matches_single(self, tmp_path):
        d = _make_npy_dir(tmp_path)
        out = tmp_path / "train.fpk"
        pack_dataset(d, out)
        reader = PackedReader(out)
        order = [3, 0, 5, 1]
        batch = reader.read_batch(order, threads=4)
        for idx, got in zip(order, batch):
            ref = reader.read(idx)
            for k in ref:
                if isinstance(ref[k], np.ndarray):
                    np.testing.assert_array_equal(got[k], ref[k])
        reader.close()

    def test_scalar_only_sample(self, tmp_path):
        out = tmp_path / "s.fpk"
        pack_samples([dict(a=1, b="x"), dict(a=2, b="y")], out)
        reader = PackedReader(out)
        assert reader.read(0) == dict(a=1, b="x")
        assert reader.read(1) == dict(a=2, b="y")
        reader.close()

    def test_out_of_range(self, tmp_path):
        d = _make_npy_dir(tmp_path, n=2)
        out = tmp_path / "t.fpk"
        pack_dataset(d, out)
        reader = PackedReader(out)
        with pytest.raises(IndexError):
            reader.read(99)
        reader.close()

    def test_bad_file_rejected(self, tmp_path):
        bad = tmp_path / "bad.fpk"
        bad.write_bytes(b"NOTAPACK" + b"\0" * 64)
        with pytest.raises(OSError):
            PackedReader(bad)


class TestPackedDataset:
    def test_loader_end_to_end(self, tmp_path):
        d = _make_npy_dir(tmp_path)
        out = tmp_path / "train.fpk"
        pack_dataset(d, out)

        ds = PackedDataset(str(out), speaker_id=3, variant="NaiveSVCDataset")
        assert len(ds) == 6
        loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        # NaiveSVCDataset collation contract
        assert b["mel"].ndim == 3 and b["mel"].shape[-1] == 128  # [B, T, M]
        assert b["contents"].shape[-1] == 256
        assert (np.asarray(b["speaker"]) == 3).all()
        assert "mel_lens" in b

    def test_matches_naive_dataset(self, tmp_path):
        from fish_diffusion_tpu.datasets.naive import NaiveSVCDataset

        d = _make_npy_dir(tmp_path)
        out = tmp_path / "train.fpk"
        pack_dataset(d, out)

        naive = NaiveSVCDataset(str(d), speaker_id=1)
        packed = PackedDataset(str(out), speaker_id=1)
        for i in range(len(naive)):
            a, b = naive[i], packed[i]
            assert set(a.keys()) == set(b.keys())
            for k in a:
                if isinstance(a[k], np.ndarray):
                    np.testing.assert_array_equal(a[k], b[k])
                else:
                    assert a[k] == b[k], k


class TestProcessShard:
    """DistributedSampler-equivalent index split (loader.process_shard)."""

    def test_disjoint_and_complete(self, tmp_path):
        d = _make_npy_dir(tmp_path, n=8)
        ds = __import__(
            "fish_diffusion_tpu.datasets.naive", fromlist=["NaiveSVCDataset"]
        ).NaiveSVCDataset(str(d), speaker_id=0)

        seen = []
        for rank in range(2):
            loader = DataLoader(
                ds, batch_size=2, shuffle=True, num_workers=1,
                process_shard=(rank, 2), seed=7,
            )
            assert len(loader) == 2  # 8 samples / 2 ranks / batch 2
            idx = [b for batch in loader._batch_indices() for b in batch]
            seen.append(set(int(i) for i in idx))
        assert seen[0].isdisjoint(seen[1])
        assert seen[0] | seen[1] == set(range(8))


class TestCorruptFiles:
    """fpk_open must reject truncated/corrupt packs cleanly (nullptr ->
    OSError), never attempt a header-driven multi-GB allocation."""

    def test_truncated_file_rejected(self, tmp_path):
        d = _make_npy_dir(tmp_path)
        out = tmp_path / "train.fpk"
        pack_dataset(d, out)
        data = out.read_bytes()
        trunc = tmp_path / "trunc.fpk"
        trunc.write_bytes(data[: len(data) // 2])
        with pytest.raises(OSError):
            PackedReader(trunc)

    def test_absurd_header_counts_rejected(self, tmp_path):
        import struct

        d = _make_npy_dir(tmp_path)
        out = tmp_path / "train.fpk"
        pack_dataset(d, out)
        data = bytearray(out.read_bytes())
        # claim 2^40 samples: the offset table alone would be 16 TiB
        data[8:16] = struct.pack("<Q", 1 << 40)
        bad = tmp_path / "bad_n.fpk"
        bad.write_bytes(bytes(data))
        with pytest.raises(OSError):
            PackedReader(bad)

        data = bytearray(out.read_bytes())
        # json extent beyond the end of file
        data[16:24] = struct.pack("<Q", len(out.read_bytes()) + 10)
        data[24:32] = struct.pack("<Q", 1 << 40)
        bad2 = tmp_path / "bad_json.fpk"
        bad2.write_bytes(bytes(data))
        with pytest.raises(OSError):
            PackedReader(bad2)
