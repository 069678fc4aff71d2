"""LIVE reference-golden parity: import the PyTorch reference's own modules
and assert our JAX ops against its actual autograd, on randomized inputs.

This retires the transcription risk in tests/test_ste.py (whose expected
gradients were produced by a probe run that is not in the tree): here the
oracle is /root/reference/pipnet/count_pipnet_utils.py (imports only torch,
loadable standalone) and /root/reference/pipnet/train.py::calculate_loss
(imports torch + tqdm + math). If the reference tree is absent the module
skips, so the suite stays runnable anywhere.

Covered live:
  - STE_Round / ClampSTE forward + backward (reference :41-84)
  - create_modified_encoding forward (reference :141-185)
  - ModifiedSTEFunction backward for every strategy (None / current_grad /
    max_grad) x respect_active_grad, on the documented probe cases AND on
    randomized integer-count batches — including the two dead-code quirks
    our ops/ste.py:16-32 docstring claims (zero-count chained-indexing
    no-op at reference :312-318, max_grad standard-branch no-op at
    reference :283-284)
  - calculate_loss value + input gradients for all three phases
    (pretrain / main / finetune), PIP-Net and Count-PIPNet flavors
    (reference train.py:165-250)
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from count_pipnet_tpu.ops import losses as jlosses
from count_pipnet_tpu.ops.ste import (
    create_modified_encoding, modified_onehot_ste, ste_clamp, ste_round,
)

REF = "/root/reference"


def _load(name, rel):
    path = os.path.join(REF, rel)
    if not os.path.exists(path):
        pytest.skip(f"reference tree not available: {path}", allow_module_level=True)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_utils = _load("_ref_count_pipnet_utils", "pipnet/count_pipnet_utils.py")
ref_train = _load("_ref_train", "pipnet/train.py")


def jax_vjp(fn, x, g):
    _, pull = jax.vjp(fn, x)
    return np.asarray(pull(jnp.asarray(g))[0])


def torch_vjp(fn, x, g):
    xt = torch.tensor(np.asarray(x), dtype=torch.float32, requires_grad=True)
    out = fn(xt)
    (grad,) = torch.autograd.grad(out, xt, torch.tensor(np.asarray(g), dtype=torch.float32))
    return out.detach().numpy(), grad.numpy()


# ---------------------------------------------------------------------------
# Elementwise STEs
# ---------------------------------------------------------------------------
class TestSteRoundLive:
    def test_forward_backward(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 7)).astype(np.float32) * 3.0
        g = rng.normal(size=(4, 7)).astype(np.float32)
        ref_out, ref_grad = torch_vjp(ref_utils.STE_Round.apply, x, g)
        np.testing.assert_allclose(np.asarray(ste_round(jnp.asarray(x))), ref_out)
        np.testing.assert_allclose(jax_vjp(ste_round, jnp.asarray(x), g), ref_grad)


class TestClampSteLive:
    @pytest.mark.parametrize("identity", [True, False])
    def test_forward_backward(self, identity):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 7)).astype(np.float32) * 4.0
        g = rng.normal(size=(4, 7)).astype(np.float32)
        ref_out, ref_grad = torch_vjp(
            lambda t: ref_utils.ClampSTE.apply(t, 0.0, 3.0, identity), x, g)
        ours = lambda t: ste_clamp(t, 0.0, 3.0, identity)
        np.testing.assert_allclose(np.asarray(ours(jnp.asarray(x))), ref_out)
        np.testing.assert_allclose(jax_vjp(ours, jnp.asarray(x), g), ref_grad)


# ---------------------------------------------------------------------------
# Modified one-hot encoding + STE
# ---------------------------------------------------------------------------
def _random_counts(rng, shape, max_count):
    """Integer-valued counts (the STE sees post-round values in the model;
    reference forward rounds internally) with a healthy share of zeros and
    above-max values."""
    c = rng.integers(0, max_count + 2, size=shape).astype(np.float32)
    return c


class TestModifiedEncodingLive:
    def test_forward_random(self):
        rng = np.random.default_rng(2)
        for max_count in (3, 5):
            x = _random_counts(rng, (6, 11), max_count)
            ref = ref_utils.create_modified_encoding(
                torch.tensor(x), max_count).numpy()
            ours = np.asarray(create_modified_encoding(jnp.asarray(x), max_count))
            np.testing.assert_allclose(ours, ref)


STRATEGIES = [None, "current_grad", "max_grad"]


class TestModifiedSteLive:
    @pytest.mark.parametrize("strategy", STRATEGIES)
    @pytest.mark.parametrize("respect_active", [False, True])
    def test_random_batches(self, strategy, respect_active):
        rng = np.random.default_rng(hash((str(strategy), respect_active)) % 2**31)
        max_count = 3
        for trial in range(20):
            counts = _random_counts(rng, (5, 9), max_count)
            g = rng.normal(size=(5, 9, max_count)).astype(np.float32)
            ref_out, ref_grad = torch_vjp(
                lambda t: ref_utils.ModifiedSTEFunction.apply(
                    t, max_count, respect_active, strategy), counts, g)
            ours = lambda t: modified_onehot_ste(
                t, max_count, respect_active, strategy)
            np.testing.assert_allclose(
                np.asarray(ours(jnp.asarray(counts))), ref_out)
            np.testing.assert_allclose(
                jax_vjp(ours, jnp.asarray(counts), g), ref_grad,
                rtol=1e-6, atol=1e-6,
                err_msg=f"trial={trial} strategy={strategy} "
                        f"respect_active={respect_active}")

    def test_zero_count_dead_code_quirk(self):
        """Reference :312-318 writes through chained indexing
        (counts_grad[zero_mask][mask] = ...), a silent no-op: zero counts
        never receive gradient. Assert that against the LIVE reference and
        that we reproduce it (ops/ste.py docstring quirk #1)."""
        counts = np.array([[0.0, 0.0]], dtype=np.float32)
        g = np.zeros((1, 2, 3), dtype=np.float32)
        g[0, 0, 0] = -2.0  # negative bin-0 grad: the INTENDED path
        g[0, 1, 0] = 2.0
        _, ref_grad = torch_vjp(
            lambda t: ref_utils.ModifiedSTEFunction.apply(t, 3, False, None),
            counts, g)
        np.testing.assert_allclose(ref_grad, np.zeros((1, 2)))  # live no-op
        got = jax_vjp(lambda t: modified_onehot_ste(t, 3, False, None),
                      jnp.asarray(counts), g)
        np.testing.assert_allclose(got, ref_grad)

    def test_max_grad_standard_branch_dead_code_quirk(self):
        """Reference :283-284 assigns through
        final_grad_nz[standard_proc_mask][decrease_mask] — chained indexing,
        another silent no-op: when ANY nonzero row is all-positive, rows
        with a negative gradient get ZERO instead of directional gradient.
        Assert live (ops/ste.py docstring quirk #2)."""
        counts = np.array([[2.0, 2.0]], dtype=np.float32)
        g = np.array([[[1.0, 2.0, 3.0],        # all-positive -> max grad 3.0
                       [-5.0, 1.0, 2.0]]],     # has negative -> dead branch
                     dtype=np.float32)
        _, ref_grad = torch_vjp(
            lambda t: ref_utils.ModifiedSTEFunction.apply(
                t, 3, False, "max_grad"), counts, g)
        np.testing.assert_allclose(ref_grad, np.array([[3.0, 0.0]]))
        got = jax_vjp(
            lambda t: modified_onehot_ste(t, 3, False, "max_grad"),
            jnp.asarray(counts), g)
        np.testing.assert_allclose(got, ref_grad)

    def test_probe_cases_from_test_ste(self):
        """The exact probe rows documented in tests/test_ste.py:79-90, now
        checked against the live reference instead of transcribed constants."""
        counts = np.array([[0.0, 0.0, 1.0, 2.0, 3.0]], dtype=np.float32)
        g = np.zeros((1, 5, 3), dtype=np.float32)
        g[0, 0, 0] = -2.0
        g[0, 1, 0] = 2.0
        g[0, 2] = [2.0, -1.0, -3.0]
        g[0, 3] = [-5.0, 1.0, 2.0]
        g[0, 4] = [1.0, 2.0, 3.0]
        _, ref_grad = torch_vjp(
            lambda t: ref_utils.ModifiedSTEFunction.apply(t, 3, False, None),
            counts, g)
        np.testing.assert_allclose(ref_grad, np.array([[0.0, 0.0, -3.0, 5.0, 1.0]]))
        got = jax_vjp(lambda t: modified_onehot_ste(t, 3), jnp.asarray(counts), g)
        np.testing.assert_allclose(got, ref_grad)


# ---------------------------------------------------------------------------
# calculate_loss — live value + gradient parity across phases
# ---------------------------------------------------------------------------
class _SilentIter:
    def set_postfix_str(self, *a, **k):
        pass


def _loss_case(rng, B=4, P=6, H=3, W=3, C=5):
    pf = rng.uniform(0.02, 1.0, size=(2 * B, H, W, P)).astype(np.float32)
    # normalize over prototypes like a softmax output would be
    pf = pf / pf.sum(axis=-1, keepdims=True)
    pooled = rng.uniform(0.0, 4.0, size=(2 * B, P)).astype(np.float32)
    out = rng.uniform(0.0, 3.0, size=(2 * B, C)).astype(np.float32)
    ys = rng.integers(0, C, size=(B,)).astype(np.int64)
    return pf, pooled, out, ys


PHASES = [  # (pretrain, finetune, aw, tw, cw)
    ("pretrain", True, False, 0.5, 5.0, 0.0),
    ("main", False, False, 5.0, 2.0, 2.0),
    ("finetune", False, True, 5.0, 2.0, 2.0),
]


class TestCalculateLossLive:
    @pytest.mark.parametrize("phase,pretrain,finetune,aw,tw,cw", PHASES)
    @pytest.mark.parametrize("is_count", [False, True])
    @pytest.mark.parametrize("sparsity", [True, False])
    def test_value_and_grads(self, phase, pretrain, finetune, aw, tw, cw,
                             is_count, sparsity):
        rng = np.random.default_rng(hash((phase, is_count, sparsity)) % 2**31)
        pf, pooled, out, ys = _loss_case(rng)
        mult = 2.0
        coeff = 0.01 if is_count else 1.0

        # --- live torch reference ---
        tpf = torch.tensor(np.moveaxis(pf, -1, 1), requires_grad=True)  # NCHW
        tpooled = torch.tensor(pooled, requires_grad=True)
        tout = torch.tensor(out, requires_grad=True)
        tloss, tacc, tcomp = ref_train.calculate_loss(
            tpf, tpooled, tout, torch.tensor(ys), aw, tw, 0.0, cw,
            torch.tensor(mult), pretrain, finetune,
            torch.nn.NLLLoss(reduction="mean"), _SilentIter(),
            is_count_pipnet=is_count, verbose=False, EPS=1e-8,
            enforce_weight_sparsity=sparsity, tanh_loss_coeff=coeff)
        tgrads = torch.autograd.grad(tloss, [tpf, tpooled, tout],
                                     allow_unused=True)

        # --- ours ---
        def ours(pf_, pooled_, out_):
            loss, _, _ = jlosses.calculate_loss(
                pf_, pooled_, out_, jnp.asarray(ys), aw, tw, cw, mult,
                pretrain_w=1.0 if pretrain else 0.0,
                finetune_w=1.0 if finetune else 0.0,
                is_count_pipnet=is_count, eps=1e-8,
                enforce_weight_sparsity=sparsity, tanh_loss_coeff=coeff)
            return loss

        jloss = ours(jnp.asarray(pf), jnp.asarray(pooled), jnp.asarray(out))
        np.testing.assert_allclose(float(jloss), float(tloss.detach()),
                                   rtol=2e-5, atol=2e-6)

        jgrads = jax.grad(ours, argnums=(0, 1, 2))(
            jnp.asarray(pf), jnp.asarray(pooled), jnp.asarray(out))
        names = ["proto_features", "pooled", "out"]
        for name, jg, tg in zip(names, jgrads, tgrads):
            jg = np.asarray(jg)
            if name == "proto_features":
                jg = np.moveaxis(jg, -1, 1)  # ours is NHWC
            if tg is None:
                tg = np.zeros_like(jg)
            else:
                tg = tg.numpy()
            np.testing.assert_allclose(
                jg, tg, rtol=2e-5, atol=2e-6,
                err_msg=f"{phase} is_count={is_count} sparsity={sparsity} "
                        f"grad wrt {name}")

    def test_components_match(self):
        rng = np.random.default_rng(7)
        pf, pooled, out, ys = _loss_case(rng)
        tloss, _, tcomp = ref_train.calculate_loss(
            torch.tensor(np.moveaxis(pf, -1, 1)), torch.tensor(pooled),
            torch.tensor(out), torch.tensor(ys), 5.0, 2.0, 0.0, 2.0,
            torch.tensor(2.0), False, False,
            torch.nn.NLLLoss(reduction="mean"), _SilentIter(),
            is_count_pipnet=True, verbose=False, EPS=1e-8,
            enforce_weight_sparsity=True, tanh_loss_coeff=0.01)
        _, _, jcomp = jlosses.calculate_loss(
            jnp.asarray(pf), jnp.asarray(pooled), jnp.asarray(out),
            jnp.asarray(ys), 5.0, 2.0, 2.0, 2.0, pretrain_w=0.0,
            finetune_w=0.0, is_count_pipnet=True, eps=1e-8,
            enforce_weight_sparsity=True, tanh_loss_coeff=0.01)
        for k in ("align", "align_weighted", "tanh", "tanh_weighted",
                  "class", "class_weighted"):
            np.testing.assert_allclose(float(jcomp[k]), tcomp[k],
                                       rtol=2e-5, atol=2e-6, err_msg=k)

    def test_uniform_loss_live(self):
        """uniform_loss exists-but-unused in the reference (train.py:253-256);
        parity keeps the capability honest."""
        rng = np.random.default_rng(11)
        x = rng.normal(size=(6, 8)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ref = ref_train.uniform_loss(torch.tensor(x)).item()
        ours = float(jlosses.uniform_loss(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# BilinearIntermediate: init-distribution + forward parity (VERDICT r3 #5)
# ---------------------------------------------------------------------------
class TestBilinearLive:
    P, M = 16, 3

    def _ours(self, seed=0):
        from count_pipnet_tpu.models.intermediates import (
            BilinearIntermediate,
        )
        mod = BilinearIntermediate(num_prototypes=self.P, max_count=self.M)
        x0 = jnp.zeros((1, self.P), jnp.float32)
        params = mod.init({"params": jax.random.PRNGKey(seed)}, x0)["params"]
        return mod, params

    def test_embed_init_exact(self):
        """The count-scaled block embedding must match the reference's
        tensor exactly (reference count_pipnet_utils.py:349-358)."""
        ref = ref_utils.BilinearIntermediate(self.P, self.M)
        _, params = self._ours()
        np.testing.assert_array_equal(
            np.asarray(params["embed"]),
            ref.embed.weight.detach().numpy())

    def test_wv_init_distribution_matches_torch_linear(self):
        """W/V must follow torch nn.Linear's default kaiming-uniform
        (U(-1/sqrt(D), 1/sqrt(D)), var 1/(3D)) — flax's lecun_normal
        default has 3x that variance, which squares to ~9x on the
        W(e)*V(e) product and was the round-3 instability suspect.
        Asserted on moments + support over many seeds (distributional —
        RNGs differ; the reference draw itself is random too)."""
        D = self.P * self.M
        bound = 1.0 / np.sqrt(D)
        ws = []
        for seed in range(8):
            _, params = self._ours(seed)
            for name in ("W", "V"):
                k = np.asarray(params[name]["kernel"])
                assert k.shape == (D, D)
                assert np.abs(k).max() <= bound + 1e-7
                ws.append(k.ravel())
        ours = np.concatenate(ws)
        ref_draws = np.concatenate([
            ref_utils.BilinearIntermediate(self.P, self.M)
            .W.weight.detach().numpy().ravel() for _ in range(8)])
        # uniform on [-b, b]: var b^2/3; allow 5% sampling slack
        np.testing.assert_allclose(ours.var(), bound ** 2 / 3, rtol=0.05)
        np.testing.assert_allclose(ours.var(), ref_draws.var(), rtol=0.05)
        np.testing.assert_allclose(ours.mean(), 0.0, atol=bound * 0.02)

    def test_forward_parity_with_copied_weights(self):
        """With the reference's drawn W/V copied in, forward must agree."""
        torch.manual_seed(3)
        ref = ref_utils.BilinearIntermediate(self.P, self.M)
        mod, params = self._ours()
        params = dict(params)
        params["W"] = {"kernel": jnp.asarray(
            ref.W.weight.detach().numpy().T)}   # torch [out,in] -> [in,out]
        params["V"] = {"kernel": jnp.asarray(
            ref.V.weight.detach().numpy().T)}
        x = np.random.default_rng(5).integers(
            0, self.M + 1, size=(9, self.P)).astype(np.float32)
        ours = mod.apply({"params": params}, jnp.asarray(x))
        theirs = ref(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=1e-5, atol=1e-5)
