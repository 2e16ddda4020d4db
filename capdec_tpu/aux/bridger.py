"""Supervised embedding bridger: image→text CLIP-space mapper.

Re-creation of the reference's bridger (others/supervised_embedding_bridger
.py): an 8-linear-layer MLP (LeakyReLU, identity-initialized square
matrices) trained with MSE to map image embeddings into text-embedding
space, used at inference via `--modality_bridger`
(predictions_runner.py:183-184,225-227).

TPU-native: the network is a JAX pytree trained with a jitted optax step
(SGD lr 1e-3 momentum 0.9, 100 epochs, batch 128 — reference :129-181);
weights save/load as a torch-style state_dict (`mlp.model.{2i}.*`) so
reference `weights_modality_mapper.pt` files remain loadable.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List

import numpy as np

DEFAULT_WEIGHTS_PATH = "others/weights_modality_mapper.pt"


def init_bridger_params(dim: int = 640, num_layers: int = 8) -> Dict:
    """Identity init (reference nn.init.eye_, :87-108): start as a no-op."""
    layers = [{"w": np.eye(dim, dtype=np.float32),
               "b": np.zeros((dim,), np.float32)} for _ in range(num_layers)]
    return {"layers": layers}


def apply_bridger(params: Dict, x):
    import jax
    import jax.numpy as jnp
    h = x
    n = len(params["layers"])
    for i, p in enumerate(params["layers"]):
        h = jnp.dot(h, p["w"], preferred_element_type=jnp.float32) + p["b"]
        if i < n - 1:
            h = jax.nn.leaky_relu(h, negative_slope=0.01)
    return h


def train_bridger(image_embeddings: np.ndarray, text_embeddings: np.ndarray,
                  dim: int = 640, num_layers: int = 8, epochs: int = 100,
                  batch_size: int = 128, lr: float = 1e-3,
                  momentum: float = 0.9, normalize: bool = True,
                  seed: int = 0, log_every: int = 20) -> Dict:
    import jax
    import jax.numpy as jnp
    import optax

    x = np.asarray(image_embeddings, np.float32)
    y = np.asarray(text_embeddings, np.float32)
    if normalize:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        y = y / np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-12)

    params = jax.tree.map(jnp.asarray, init_bridger_params(dim, num_layers))
    tx = optax.sgd(lr, momentum=momentum)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = apply_bridger(p, xb)
            return jnp.mean(jnp.square(pred - yb))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = x.shape[0]
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(0, n - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(x[idx]),
                                           jnp.asarray(y[idx]))
            losses.append(float(loss))
        if epoch % log_every == 0 or epoch == epochs - 1:
            print(f"bridger epoch {epoch}: mse={np.mean(losses):.6f}",
                  flush=True)
    return jax.tree.map(np.asarray, params)


# -- torch state_dict interop (keys `mlp.model.{2i}.weight/bias`) -----------


def bridger_to_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for i, p in enumerate(params["layers"]):
        out[f"mlp.model.{2 * i}.weight"] = np.asarray(p["w"]).T
        out[f"mlp.model.{2 * i}.bias"] = np.asarray(p["b"])
    return out


def bridger_from_state_dict(sd: Dict[str, Any]) -> Dict:
    layers: List[Dict] = []
    i = 0
    while f"mlp.model.{2 * i}.weight" in sd:
        w = sd[f"mlp.model.{2 * i}.weight"]
        b = sd[f"mlp.model.{2 * i}.bias"]
        if hasattr(w, "detach"):
            w, b = w.detach().cpu().numpy(), b.detach().cpu().numpy()
        layers.append({"w": np.asarray(w, np.float32).T,
                       "b": np.asarray(b, np.float32)})
        i += 1
    return {"layers": layers}


def save_bridger(params: Dict, path: str) -> None:
    from ..utils.checkpoint import save_state_dict
    save_state_dict(bridger_to_state_dict(params), path)


def load_bridger_fn(dim: int = 640, path: str = DEFAULT_WEIGHTS_PATH):
    """Inference hook mirroring get_map_to_text_space_using_modality_bridger
    (reference others/supervised_embedding_bridger.py:21-30)."""
    import jax
    import jax.numpy as jnp
    from ..utils.checkpoint import load_state_dict

    params = jax.tree.map(jnp.asarray,
                          bridger_from_state_dict(load_state_dict(path)))
    fn = jax.jit(lambda x: apply_bridger(params, x))
    return lambda x: np.asarray(fn(jnp.asarray(np.asarray(x, np.float32))))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True,
                   help="embedding pickle with paired image+text embeddings")
    p.add_argument("--out", default=DEFAULT_WEIGHTS_PATH)
    p.add_argument("--dim", type=int, default=640)
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args(argv)
    with open(args.data, "rb") as f:
        data = pickle.load(f)

    def to_np(v):
        return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
                else np.asarray(v, np.float32))

    params = train_bridger(to_np(data["clip_embedding"]),
                           to_np(data["clip_embedding_text_dave"]),
                           dim=args.dim, epochs=args.epochs)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_bridger(params, args.out)
    print(f"saved bridger to {args.out}", flush=True)


if __name__ == "__main__":
    main()
