"""Visual feature extraction: face crops -> MANet [T, 1024] embeddings.

Reference (feature_extraction/visual/extract_manet_embedding.py): per
video, OpenFace face crops resized to 224x224, ToTensor (0..1, no
normalization), batched MANet ``return_embedding=True``, frames sorted by
filename, FRAME saves [T, 1024] / UTTERANCE mean-pools (:82-92,108-163).

TPU rebuild: frames from all videos are pooled into fixed-size batches for
one jitted MANet forward (static shapes, no per-video remainder batches);
PIL replaces torchvision transforms (cv2 is not in this image).
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import List

import numpy as np


def load_face(path: str, size: int = 224) -> np.ndarray:
    """PIL-based Resize((224,224)) + ToTensor equivalent -> [H, W, 3] in 0..1."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def extract_video_embeddings(
    model,
    variables,
    frames: List[np.ndarray],
    batch_size: int = 32,
) -> np.ndarray:
    """frames: list of [224, 224, 3] arrays -> [T, 1024]."""
    import jax
    import jax.numpy as jnp

    variables = jax.device_put(variables)  # jit arg, not HLO constants

    @jax.jit
    def run_p(v, batch):
        return model.apply(v, batch)

    def run(batch):
        return run_p(variables, batch)

    out = []
    n = len(frames)
    for s in range(0, n, batch_size):
        chunk = frames[s : s + batch_size]
        batch = np.zeros((batch_size, 224, 224, 3), np.float32)
        batch[: len(chunk)] = np.stack(chunk)
        emb = np.asarray(run(jnp.asarray(batch)))
        out.append(emb[: len(chunk)])
    return np.concatenate(out, axis=0)


def sample_frame_paths(video_dir: str, policy: str = "all", n: int = 16) -> List[str]:
    """Frame-sampling policies (reference toolkit/utils/functions.py:79-118):
    'all' keeps every frame; 'uniform' picks n evenly spaced; 'head'/'center'
    take the first/middle n — name-sorted like the reference (:91)."""
    paths = sorted(glob.glob(os.path.join(video_dir, "*")))
    if policy == "all" or len(paths) <= n:
        return paths
    if policy == "uniform":
        idx = np.linspace(0, len(paths) - 1, n).round().astype(int)
        return [paths[i] for i in idx]
    if policy == "head":
        return paths[:n]
    if policy == "center":
        s = max((len(paths) - n) // 2, 0)
        return paths[s : s + n]
    raise ValueError(policy)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="torch MANet checkpoint (.pth)")
    parser.add_argument("--face_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--feature_level", type=str, default="FRAME",
                        choices=["FRAME", "UTTERANCE"])
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)

    import torch

    from sdumc_tpu.convert.torch_manet import torch_manet_to_params
    from sdumc_tpu.models.manet import MANet, MANetConfig

    blob = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    variables = torch_manet_to_params(sd)
    model = MANet(MANetConfig())

    save_dir = os.path.join(args.save_dir, f"manet_{args.feature_level[:3]}")
    os.makedirs(save_dir, exist_ok=True)
    vids = sorted(os.listdir(args.face_dir))
    print(f'Find total "{len(vids)}" videos.')
    t0 = time.time()
    for i, vid in enumerate(vids, 1):
        paths = sample_frame_paths(os.path.join(args.face_dir, vid))
        if not paths:
            feat = np.zeros((1, 1024), np.float32)
        else:
            frames = [load_face(p) for p in paths]
            feat = extract_video_embeddings(model, variables, frames, args.batch_size)
        if args.feature_level == "UTTERANCE":
            feat = feat.mean(axis=0)
        np.save(os.path.join(save_dir, f"{vid}.npy"), feat.astype(np.float32))
        if i % 50 == 0:
            print(f"{i}/{len(vids)}")
    print(f"Total time used: {time.time() - t0:.1f}s.")


if __name__ == "__main__":
    main()
