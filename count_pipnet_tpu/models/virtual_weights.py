"""Virtual-weight machinery for Count-PIPNet interpretability.

Reference: pipnet/count_pipnet.py:226-321 —
``estimate_mean_intermediate_features`` runs the whole dataset through the
model at inference, collects clamped counts, maps them through the
intermediate layer and averages; ``calculate_virtual_weights`` builds the
virtual [num_classes, num_prototypes] matrix, optionally scaling the onehot
attribution by those dataset-mean intermediate features
(``custom_onehot_scale``).

TPU redesign: batched jitted forwards (the reference loops a DataLoader and
concatenates on host), then a single matmul for the virtual matrix.
"""



import jax
import jax.numpy as jnp
import numpy as np


from .pipnet import CountPIPNet, importance_per_class

__all__ = ["estimate_mean_intermediate_features", "calculate_virtual_weights"]


def estimate_mean_intermediate_features(model: CountPIPNet, params,
                                        batch_stats, loader, *, tau=1.0,
                                        batch=64, rng=None,
                                        return_full_data=False):
    """Mean intermediate features over a dataset's clamped counts.

    Returns [intermediate_dim] means (or (features [N, D], labels [N]) when
    ``return_full_data``). Reference: count_pipnet.py:226-281.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model_state = {"batch_stats": batch_stats} if batch_stats else {}

    @jax.jit
    def fwd(xs, sub):
        _, clamped, _ = model.apply(
            {"params": params, **model_state}, xs, inference=True,
            train=False, tau=tau, rngs={"gumbel": sub})
        return clamped.astype(jnp.float32)

    inter_mod = None
    from .intermediates import make_intermediate
    inter_mod = make_intermediate(
        model.intermediate_type, model.num_prototypes, model.max_count,
        use_ste=model.use_ste,
        positive_grad_strategy=model.positive_grad_strategy)

    @jax.jit
    def inter_fwd(counts):
        return inter_mod.apply(
            {"params": params.get("intermediate", {})}, counts)

    feats, labels = [], []
    buf_x, buf_y = [], []

    def flush():
        nonlocal rng
        if not buf_x:
            return
        n = len(buf_x)
        xs = np.stack(buf_x)
        if n < batch:
            xs = np.concatenate([xs, np.repeat(xs[-1:], batch - n, axis=0)])
        rng, sub = jax.random.split(rng)
        clamped = fwd(jnp.asarray(xs), sub)[:n]
        feats.append(np.asarray(inter_fwd(clamped)))
        labels.extend(buf_y)
        buf_x.clear()
        buf_y.clear()

    for item in loader:
        xs, ys = item[0], item[-1]
        for i in range(xs.shape[0]):
            buf_x.append(np.asarray(xs[i], np.float32))
            buf_y.append(int(ys[i]))
            if len(buf_x) == batch:
                flush()
    flush()

    features = (np.concatenate(feats) if feats
                else np.zeros((0, inter_mod.output_dim), np.float32))
    if return_full_data:
        return features, np.asarray(labels, np.int64)
    return features.mean(axis=0)


def calculate_virtual_weights(model: CountPIPNet, params, batch_stats,
                              loader=None, *, custom_onehot_scale=False,
                              tau=1.0) -> jnp.ndarray:
    """Virtual [num_classes, num_prototypes] classification matrix.

    With ``custom_onehot_scale`` and a onehot intermediate, scales the
    attribution by the dataset-mean intermediate features before the
    importance matmul (reference count_pipnet.py:283-321).
    """
    scalars = None
    is_onehot = model.intermediate_type == "onehot"
    if is_onehot and custom_onehot_scale:
        if loader is None:
            raise ValueError("custom_onehot_scale requires a dataloader")
        print("Intermediate is onehot, computing mean intermediate "
              "features...", flush=True)
        scalars = jnp.asarray(estimate_mean_intermediate_features(
            model, params, batch_stats, loader, tau=tau))
    bound = model.bind({"params": params})
    return importance_per_class(bound, params,
                                classifier_input_scalars=scalars)
