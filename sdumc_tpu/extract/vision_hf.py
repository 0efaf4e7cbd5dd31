"""Alternative visual extractors: CLIP / DINOv2 / VideoMAE / EVA-02 /
ImageNet ResNet.

Reference (feature_extraction/visual/extract_vision_huggingface.py and
extract_imagenet_embedding.py): per video, OpenFace face frames (resampled
every 5th frame, :100-107), HF processor normalize, batched
``get_image_features`` (CLIP) or truncated-resnet18 forward (ImageNet),
saved FRAME [T, D] / UTTERANCE [D] with the empty/one-frame edge cases
(:186-200).

TPU rebuild: host-side PIL preprocessing (the HF processor's resize +
normalize re-derived — no processor object needed), fixed-size jitted
batches, one compiled program per model.
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import List, Optional

import numpy as np

# HF CLIPImageProcessor constants (openai/clip-vit-*)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
# torchvision ImageNet constants (extract_imagenet_embedding.py:158-160)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resample_frames(paths: List[str], step: int = 5) -> List[str]:
    """Every ``step``-th frame, name order (reference :100-107)."""
    return paths[::step]


def load_normalized(path: str, size: int, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """Resize + scale to 0..1 + channel normalize -> [size, size, 3]."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - mean) / std


def batched_embed(run, frames: List[np.ndarray], size: int,
                  batch_size: int = 32) -> np.ndarray:
    """Fixed-shape batched forward; remainder rows zero-padded and sliced."""
    import jax.numpy as jnp

    out = []
    for s in range(0, len(frames), batch_size):
        chunk = frames[s: s + batch_size]
        batch = np.zeros((batch_size, size, size, 3), np.float32)
        batch[: len(chunk)] = np.stack(chunk)
        out.append(np.asarray(run(jnp.asarray(batch)))[: len(chunk)])
    return np.concatenate(out, axis=0) if out else np.zeros((0, 0), np.float32)


def save_embeddings(save_path: str, embeddings: np.ndarray, dim: int,
                    feature_level: str) -> None:
    """The reference's FRAME/UTTERANCE save semantics incl. empty/single
    frame edge cases (extract_vision_huggingface.py:186-200)."""
    emb = np.asarray(embeddings).squeeze()
    if feature_level == "FRAME":
        if emb.size == 0:
            emb = np.zeros((1, dim), np.float32)
        elif emb.ndim == 1:
            emb = emb[None, :]
    else:
        if emb.size == 0:
            emb = np.zeros((dim,), np.float32)
        elif emb.ndim == 2:
            emb = emb.mean(axis=0)
    np.save(save_path, emb.astype(np.float32))


def extract_dir(
    run,
    face_dir: str,
    save_dir: str,
    *,
    image_size: int,
    mean: np.ndarray,
    std: np.ndarray,
    dim: int,
    feature_level: str = "FRAME",
    resample_step: int = 5,
    batch_size: int = 32,
    skip_existing: bool = True,
) -> int:
    """Directory driver: one subdir of face frames per video."""
    os.makedirs(save_dir, exist_ok=True)
    vids = sorted(os.listdir(face_dir))
    done = 0
    t0 = time.time()
    for vid in vids:
        save_path = os.path.join(save_dir, f"{vid}.npy")
        if skip_existing and os.path.exists(save_path):
            continue
        paths = resample_frames(
            sorted(glob.glob(os.path.join(face_dir, vid, "*"))), resample_step)
        frames = [load_normalized(p, image_size, mean, std) for p in paths]
        emb = (batched_embed(run, frames, image_size, batch_size)
               if frames else np.zeros((0, dim), np.float32))
        save_embeddings(save_path, emb, dim, feature_level)
        done += 1
    print(f"extracted {done}/{len(vids)} videos in {time.time() - t0:.1f}s")
    return done


def build_clip_runner(model_dir: str):
    """jitted CLIP get_image_features + its (size, mean, std, dim)."""
    import jax

    from sdumc_tpu.convert.hf_clip import load_hf_clip_vision
    from sdumc_tpu.models.clip_vit import CLIPVisionTower

    cfg, params = load_hf_clip_vision(model_dir)
    model = CLIPVisionTower(cfg)

    params = jax.device_put(params)  # jit arg, not HLO constants

    @jax.jit
    def run_p(p, pixels):
        return model.apply({"params": p}, pixels)["image_features"]

    return (lambda pixels: run_p(params, pixels),
            cfg.image_size, CLIP_MEAN, CLIP_STD, cfg.projection_dim)


def build_resnet_runner(checkpoint: Optional[str] = None):
    """jitted truncated-resnet18 embedding + its (size, mean, std, dim)."""
    import jax
    import jax.numpy as jnp

    from sdumc_tpu.models.resnet import ResNetConfig, ResNetEmbedding

    cfg = ResNetConfig()
    model = ResNetEmbedding(cfg)
    if checkpoint:
        import torch

        from sdumc_tpu.convert.torch_resnet import torch_resnet_to_params

        sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        variables = torch_resnet_to_params(sd)
    else:
        import jax.random as jr

        variables = model.init(jr.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    variables = jax.device_put(variables)  # jit arg, not HLO constants

    @jax.jit
    def run_p(v, pixels):
        return model.apply(v, pixels, train=False)

    return (lambda pixels: run_p(variables, pixels),
            224, IMAGENET_MEAN, IMAGENET_STD, cfg.channels[-1])


def build_dinov2_runner(model_dir: str):
    """jitted DINOv2 CLS embedding + its (size, mean, std, dim) — the
    self-supervised ViT alternative (reference drives it via AutoModel,
    extract_vision_huggingface.py:134-146)."""
    import jax

    from sdumc_tpu.convert.hf_dinov2 import load_hf_dinov2
    from sdumc_tpu.models.dinov2 import Dinov2Model

    cfg, params = load_hf_dinov2(model_dir)
    model = Dinov2Model(cfg)
    params = jax.device_put(params)  # jit arg, not HLO constants

    @jax.jit
    def run_p(p, pixels):
        return model.apply({"params": p}, pixels)["pooled"]

    return (lambda pixels: run_p(params, pixels),
            cfg.image_size, IMAGENET_MEAN, IMAGENET_STD, cfg.hidden_size)


def build_eva02_runner(model_dir: str):
    """jitted EVA-02 pooled embedding + its (size, mean, std, dim) — the
    timm family in the reference's alternatives list
    (extract_vision_huggingface.py:23,142-146), loaded raw from the
    checkpoint so timm itself is not needed. Preprocessing follows the timm
    data config for the mim_in22k weights (bicubic resize, ImageNet
    mean/std)."""
    import jax

    from sdumc_tpu.convert.timm_eva02 import load_timm_eva02
    from sdumc_tpu.models.eva02 import Eva02Model

    cfg, params = load_timm_eva02(model_dir)
    model = Eva02Model(cfg)
    params = jax.device_put(params)  # jit arg, not HLO constants

    @jax.jit
    def run_p(p, pixels):
        return model.apply({"params": p}, pixels)["pooled"]

    return (lambda pixels: run_p(params, pixels),
            cfg.image_size, IMAGENET_MEAN, IMAGENET_STD, cfg.hidden_size)


def build_videomae_runner(model_dir: str):
    """jitted VideoMAE window embedding + its metadata. Videos are chunked
    into ``num_frames`` windows (tail repeated), one token-mean embedding
    per window — the temporal family in the reference's alternatives list."""
    import jax

    from sdumc_tpu.convert.hf_videomae import load_hf_videomae
    from sdumc_tpu.models.videomae import VideoMAEModel

    cfg, params = load_hf_videomae(model_dir)
    model = VideoMAEModel(cfg)
    params = jax.device_put(params)  # jit arg, not HLO constants

    @jax.jit
    def run_p(p, video):
        return model.apply({"params": p}, video)["pooled"]

    def run_windows(frames):
        """list of [size, size, 3] frames -> [n_windows, D]."""
        import jax.numpy as jnp

        T = cfg.num_frames
        n = max((len(frames) + T - 1) // T, 1)
        out = []
        for w in range(n):
            win = frames[w * T:(w + 1) * T]
            while len(win) < T:
                win.append(win[-1] if win else
                           np.zeros((cfg.image_size, cfg.image_size, 3),
                                    np.float32))
            out.append(np.asarray(
                run_p(params, jnp.asarray(np.stack(win)[None]))[0]))
        return np.stack(out)

    return (run_windows, cfg.image_size, IMAGENET_MEAN, IMAGENET_STD,
            cfg.hidden_size)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", type=str, default="clip",
                        choices=["clip", "dinov2", "videomae", "eva02",
                                 "imagenet"])
    parser.add_argument("--model_dir", type=str, default=None,
                        help="HF CLIP checkpoint dir (clip mode)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="torchvision resnet18 state dict (imagenet mode)")
    parser.add_argument("--face_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--feature_level", type=str, default="FRAME")
    parser.add_argument("--resample_step", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)

    if args.model == "clip":
        assert args.model_dir, "--model_dir required for clip"
        run, size, mean, std, dim = build_clip_runner(args.model_dir)
    elif args.model == "dinov2":
        assert args.model_dir, "--model_dir required for dinov2"
        run, size, mean, std, dim = build_dinov2_runner(args.model_dir)
    elif args.model == "eva02":
        assert args.model_dir, "--model_dir required for eva02"
        run, size, mean, std, dim = build_eva02_runner(args.model_dir)
    elif args.model == "videomae":
        assert args.model_dir, "--model_dir required for videomae"
        run_windows, size, mean, std, dim = build_videomae_runner(args.model_dir)
        os.makedirs(args.save_dir, exist_ok=True)
        vids = sorted(os.listdir(args.face_dir))
        t0 = time.time()
        for vid in vids:
            save_path = os.path.join(args.save_dir, f"{vid}.npy")
            if os.path.exists(save_path):
                continue
            paths = resample_frames(sorted(glob.glob(
                os.path.join(args.face_dir, vid, "*"))), args.resample_step)
            frames = [load_normalized(p, size, mean, std) for p in paths]
            emb = (run_windows(frames) if frames
                   else np.zeros((1, dim), np.float32))
            save_embeddings(save_path, emb, dim, args.feature_level)
        print(f"extracted {len(vids)} videos in {time.time() - t0:.1f}s")
        return
    else:
        run, size, mean, std, dim = build_resnet_runner(args.checkpoint)

    extract_dir(
        run, args.face_dir, args.save_dir,
        image_size=size, mean=mean, std=std, dim=dim,
        feature_level=args.feature_level,
        resample_step=args.resample_step, batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
