"""MANet FER trainer (RAF-DB) — TPU rebuild of the standalone trainer.

Reference (feature_extraction/visual/manet/main.py): SGD(lr 0.01, momentum
0.9, wd 1e-4), StepLR(15, 0.1), 100 epochs, batch 128, two-head
cross-entropy mixed with beta=0.6 (:172-173), best-accuracy checkpointing,
plus reorganize_rafdb.py's ImageFolder layout. Data augmentation
(RandomResizedCrop + flip) runs on host; the train step is one jit over the
data-parallel mesh.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from sdumc_tpu.models.manet import MANet, MANetConfig


def two_head_loss(logits1, logits2, labels, beta: float = 0.6):
    import jax
    import jax.numpy as jnp

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    loss = beta * ce(logits1) + (1.0 - beta) * ce(logits2)
    combined = beta * logits1 + (1.0 - beta) * logits2
    acc = jnp.mean((jnp.argmax(combined, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


def make_train_step(model, beta: float, lr_schedule, momentum=0.9, wd=1e-4):
    import jax
    import optax
    from flax.training import train_state

    class TrainState(train_state.TrainState):
        batch_stats: dict = None

    tx = optax.chain(
        optax.add_decayed_weights(wd),
        optax.sgd(learning_rate=lr_schedule, momentum=momentum),
    )

    def create_state(variables):
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
        )
        # pin the python-int step to int32 — otherwise the first update
        # changes its aval and jit recompiles the whole step (train/state.py)
        import jax.numpy as jnp

        return state.replace(step=jnp.asarray(0, jnp.int32))

    @jax.jit
    def step(state, images, labels):
        def loss_fn(p):
            (l1, l2), updates = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, images,
                return_embedding=False, train=True, mutable=["batch_stats"],
            )
            loss, acc = two_head_loss(l1, l2, labels, beta)
            return loss, (acc, updates["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, "acc": acc}

    return create_state, step


def random_resized_crop_flip(rng: np.random.Generator, img: np.ndarray, size=224):
    """Host-side RandomResizedCrop((224,224)) + RandomHorizontalFlip."""
    from PIL import Image

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = rng.uniform(0.08, 1.0) * area
        ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if cw <= w and ch <= h:
            x0 = rng.integers(0, w - cw + 1)
            y0 = rng.integers(0, h - ch + 1)
            crop = img[y0 : y0 + ch, x0 : x0 + cw]
            break
    else:
        crop = img
    pil = Image.fromarray((crop * 255).astype(np.uint8))
    out = np.asarray(pil.resize((size, size), Image.BILINEAR), np.float32) / 255.0
    if rng.random() < 0.5:
        out = out[:, ::-1]
    return out


def image_folder(root: str):
    """torchvision ImageFolder layout: root/class_x/img.jpg -> (paths, labels)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    for ci, cls in enumerate(classes):
        for fn in sorted(os.listdir(os.path.join(root, cls))):
            paths.append(os.path.join(root, cls, fn))
            labels.append(ci)
    return paths, np.array(labels), classes


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int = 15, gamma: float = 0.1):
    def sched(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // step_size)

    return sched


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=str, required=True, help="ImageFolder root with train/ test/")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--beta", type=float, default=0.6)
    parser.add_argument("--checkpoint_path", type=str, default="./saved/manet")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sdumc_tpu.extract.visual import load_face

    train_paths, train_labels, classes = image_folder(os.path.join(args.data, "train"))
    test_paths, test_labels, _ = image_folder(os.path.join(args.data, "test"))
    model = MANet(MANetConfig(num_classes=len(classes)))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), return_embedding=False
    )
    steps_per_epoch = len(train_paths) // args.batch_size
    create_state, step = make_train_step(
        model, args.beta, step_lr(args.lr, steps_per_epoch)
    )
    state = create_state(variables)

    rng = np.random.default_rng(0)
    best_acc = 0.0
    for epoch in range(args.epochs):
        order = rng.permutation(len(train_paths))
        t0 = time.time()
        for s in range(0, steps_per_epoch * args.batch_size, args.batch_size):
            idx = order[s : s + args.batch_size]
            imgs = np.stack([
                random_resized_crop_flip(rng, load_face(train_paths[i]))
                for i in idx
            ])
            state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(train_labels[idx]))
        # eval
        correct = 0
        for s in range(0, len(test_paths), args.batch_size):
            imgs = np.stack([load_face(p) for p in test_paths[s : s + args.batch_size]])
            l1, l2 = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(imgs), return_embedding=False)
            pred = np.asarray(jnp.argmax(args.beta * l1 + (1 - args.beta) * l2, -1))
            correct += int((pred == test_labels[s : s + len(pred)]).sum())
        acc = correct / len(test_paths)
        print(f"epoch {epoch + 1}: test acc {acc:.4f} ({time.time() - t0:.1f}s)")
        if acc > best_acc:
            best_acc = acc
            try:
                import orbax.checkpoint as ocp

                ckptr = ocp.StandardCheckpointer()
                ckptr.save(
                    os.path.abspath(os.path.join(args.checkpoint_path, "model_best")),
                    {"params": jax.device_get(state.params), "epoch": epoch,
                     "best_acc": best_acc},
                    force=True,
                )
                ckptr.wait_until_finished()
            except ImportError:
                pass

    print(f"best acc: {best_acc:.4f}")


if __name__ == "__main__":
    main()
