"""Tests for the native (C++) host components: the prefetching clip loader
(vs cv2 ground truth) and the CLIP BPE tokenizer (vs transformers
CLIPTokenizer built from the same synthetic merges)."""

import json

import numpy as np
import pytest

from followyourclick_tpu.native import load_library

pytestmark = pytest.mark.skipif(
    load_library("loader") is None, reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("vid") / "clip.avi"
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 8, (64, 48)
    )
    rs = np.random.RandomState(0)
    frames = []
    for i in range(12):
        # large flat blocks survive MJPG compression recognisably
        f = np.full((48, 64, 3), i * 20, np.uint8)
        f[:, : 8 * (i + 1)] = 255 - i * 20
        frames.append(f)
        w.write(f)
    w.release()
    return str(path), frames


class TestNativeLoader:
    def test_image_request(self, tmp_path):
        import cv2

        from followyourclick_tpu.data.native_loader import NativeClipLoader

        img = (np.random.RandomState(1).rand(100, 80, 3) * 255).astype(
            np.uint8
        )
        p = tmp_path / "img.png"
        cv2.imwrite(str(p), img[..., ::-1])

        loader = NativeClipLoader(num_workers=2)
        rid = loader.submit(str(p), None, (64, 64), crop_mode=0)
        got_id, frames = loader.next()
        assert got_id == rid
        assert frames.shape == (1, 64, 64, 3)
        loader.close()

    def test_video_clip(self, video_file):
        from followyourclick_tpu.data.native_loader import NativeClipLoader

        path, frames_gt = video_file
        loader = NativeClipLoader(num_workers=2)
        idx = [0, 3, 7]
        loader.submit(path, idx, (48, 64), crop_mode=1)
        _, clip = loader.next()
        assert clip.shape == (3, 48, 64, 3)
        for j, fi in enumerate(idx):
            # MJPG is lossy; mean error must still be small
            err = np.abs(
                clip[j].astype(float) - frames_gt[fi].astype(float)
            ).mean()
            assert err < 10, (fi, err)
        loader.close()

    def test_parallel_requests_and_error(self, video_file, tmp_path):
        from followyourclick_tpu.data.native_loader import NativeClipLoader

        path, _ = video_file
        loader = NativeClipLoader(num_workers=3)
        ids = [loader.submit(path, [0, 1], (32, 32)) for _ in range(4)]
        bad = loader.submit(str(tmp_path / "missing.mp4"), [0], (32, 32))
        got = set()
        errors = 0
        for _ in range(5):
            try:
                rid, clip = loader.next()
                got.add(rid)
                assert clip.shape == (2, 32, 32, 3)
            except IOError:
                errors += 1
        assert got == set(ids)
        assert errors == 1
        loader.close()


def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _build_vocab(merges):
    byte_enc = _bytes_to_unicode()
    vocab = list(byte_enc.values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for a, b in merges:
        vocab.append(a + b)
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    return {tok: i for i, tok in enumerate(vocab)}


@pytest.fixture(scope="module")
def tokenizer_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    # merges that compose "cat</w>", "dog</w>", "the</w>", "ing</w>"
    merges = [
        ("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
        ("t", "h"), ("th", "e</w>"), ("i", "n"), ("in", "g</w>"),
        ("e", "r</w>"), ("a", "t</w>"),
    ]
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    vocab = _build_vocab(merges)
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d


class TestNativeTokenizer:
    @pytest.fixture(scope="class")
    def pair(self, tokenizer_files):
        transformers = pytest.importorskip("transformers")
        hf = transformers.CLIPTokenizer(
            vocab_file=str(tokenizer_files / "vocab.json"),
            merges_file=str(tokenizer_files / "merges.txt"),
        )
        from followyourclick_tpu.utils.native_tokenizer import (
            NativeCLIPTokenizer,
        )

        native = NativeCLIPTokenizer(str(tokenizer_files / "merges.txt"))
        return hf, native

    @pytest.mark.parametrize("text", [
        "the cat",
        "a dog eating",
        "The CAT!!",
        "cater dogging",
        "it's the dog's cat",
        "猫",             # non-ASCII falls back to byte tokens
        "123 cats",
        "   spaced   out   ",
        "",
    ])
    def test_matches_transformers(self, pair, text):
        hf, native = pair
        ref = hf([text], padding="max_length", max_length=77,
                 truncation=True, return_tensors="np").input_ids[0]
        got = native([text]).input_ids[0]
        np.testing.assert_array_equal(got, ref)

    def test_truncation(self, pair):
        hf, native = pair
        text = "cat " * 200
        ref = hf([text], padding="max_length", max_length=77,
                 truncation=True, return_tensors="np").input_ids[0]
        got = native([text]).input_ids[0]
        np.testing.assert_array_equal(got, ref)
