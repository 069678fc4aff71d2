"""Interpretability: latent->pixel coordinate parity, projection scoring,
saliency methods on a tiny model."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.interpret.vis_pipnet import get_img_coordinates
from count_pipnet_tpu.utils.func import get_patch_size


class TestGetImgCoordinates:
    """Values mirror the reference implementation
    (util/vis_pipnet.py:1162-1193)."""

    def test_generic_interior(self):
        # image 192, latent 22 -> patch 32, skip = round(160/21) = 8
        patchsize, skip = get_patch_size(192, 22)
        assert (patchsize, skip) == (32, 8)
        h0, h1, w0, w1 = get_img_coordinates(192, (16, 22, 22), patchsize,
                                             skip, 5, 7)
        assert (h0, h1) == (40, 72)
        assert (w0, w1) == (56, 88)

    def test_generic_edges_clamped(self):
        patchsize, skip = get_patch_size(192, 22)
        h0, h1, w0, w1 = get_img_coordinates(192, (16, 22, 22), patchsize,
                                             skip, 21, 0)
        assert h1 == 192 and h0 == 160  # pinned to image edge
        assert w0 == 0 and w1 == 32

    def test_26x26_special_case(self):
        patchsize, skip = get_patch_size(224, 26)
        assert (patchsize, skip) == (32, 8)
        # interior: h_coor_min = (h-1)*skip + 4
        h0, h1, w0, w1 = get_img_coordinates(224, (0, 26, 26), patchsize,
                                             skip, 10, 10)
        assert (h0, h1) == (76, 108)
        assert (w0, w1) == (76, 108)
        # first index clamps to 0
        h0, h1, _, _ = get_img_coordinates(224, (0, 26, 26), patchsize,
                                           skip, 0, 5)
        assert h0 == 0 and h1 == 32
        # last index: the -4 shift then pinned to image edge
        h0, h1, _, _ = get_img_coordinates(224, (0, 26, 26), patchsize,
                                           skip, 25, 5)
        assert h1 == 224 and h0 == 192


class TinyTrainer:
    """Minimal trainer-like wrapper for the interpret APIs."""

    def __init__(self):
        from count_pipnet_tpu.models import get_count_network

        class Args:
            net = "convnext_tiny_26"
            num_features = 4
            use_mid_layers = True
            num_stages = 1
            bias = False
            activation = "softmax"
            intermediate_layer = "onehot"
            positive_grad_strategy = None
            backward_clamp_strategy = "Identity"
            disable_pretrained = True

        self.model, _ = get_count_network(3, Args, max_count=3,
                                          use_ste=True)
        x = jnp.zeros((1, 32, 32, 3))
        self.params = self.model.init(
            {"params": jax.random.PRNGKey(0)}, x)["params"]
        self.batch_stats = {}
        self.tau = 1.0


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from count_pipnet_tpu.data.generate_shapes import \
        GeometricShapesGenerator
    from count_pipnet_tpu.data import augment as A
    from count_pipnet_tpu.data.datasets import ImageFolder, \
        TransformedDataset
    from count_pipnet_tpu.data.loader import DataLoader

    root = tmp_path_factory.mktemp("interp")
    gen = GeometricShapesGenerator({
        "output_dir": str(root / "ds"), "img_size": 32,
        "train_samples_per_class": 3, "test_samples_per_class": 0,
        "seed": 0, "size_mean": 8, "size_std": 1,
        "min_object_size": 6, "max_object_size": 10,
        "class_definitions": [("circle", 1), ("triangle", 2),
                              ("hexagon", 3)],
    })
    gen.generate_dataset()
    t = A.Compose([A.Resize(32), A.ToArray(), A.Normalize()])
    ds = TransformedDataset(ImageFolder(root / "ds/train"), t)
    loader = DataLoader(ds, 1, shuffle=False, drop_last=False,
                        num_workers=1, seed=0)
    return TinyTrainer(), loader, root


class TestProjectionScoring:
    def test_score_projection_set(self, tiny_setup):
        from count_pipnet_tpu.interpret.vis_pipnet import \
            score_projection_set
        trainer, loader, _ = tiny_setup
        stats = score_projection_set(trainer.model, trainer.params,
                                     trainer.batch_stats, loader, batch=4)
        assert stats["pooled"].shape == (9, 4)
        assert stats["ys"].shape == (9,)
        assert stats["h_idx"].max() < 8 and stats["h_idx"].min() >= 0

    def test_vizualize_network_renders(self, tiny_setup):
        from count_pipnet_tpu.interpret.vis_pipnet import vizualize_network
        trainer, loader, root = tiny_setup

        class VArgs:
            log_dir = str(root / "run")
            image_size = 32
            wshape = 8

        topks = vizualize_network(
            trainer, loader, 3, "vis", VArgs, k=3,
            are_pretraining_prototypes=True, plot_histograms=False,
            visualize_prototype_maps=False)
        assert len(topks) == 4  # all prototypes during pretraining
        out_dir = root / "run/vis"
        assert out_dir.exists()
        assert any(f.name.startswith("grid_topk")
                   for f in out_dir.iterdir())

    def test_prototype_map_renders(self, tiny_setup):
        """Rich feature-map artifacts (reference vis_pipnet.py:354-486,
        :888-1032): original+rect, side-by-side heatmap, masked overlay,
        count debug txt — under feature_maps/prototype_<p>/."""
        from count_pipnet_tpu.interpret.vis_pipnet import vizualize_network
        trainer, loader, root = tiny_setup

        class VArgs:
            log_dir = str(root / "run")
            image_size = 32
            wshape = 8

        vizualize_network(
            trainer, loader, 3, "vis_maps", VArgs, k=3,
            are_pretraining_prototypes=True, plot_histograms=False,
            visualize_prototype_maps=True, plot_topk=False)
        fm_dir = root / "run/vis_maps/feature_maps"
        assert fm_dir.exists()
        proto_dirs = [d for d in fm_dir.iterdir() if d.is_dir()]
        assert proto_dirs, "no prototype dirs rendered"
        names = [f.name for d in proto_dirs for f in d.iterdir()]
        assert any(n.endswith("_original.png") for n in names)
        assert any(n.endswith("_feature_map.png") for n in names)
        assert any(n.endswith("_overlay.png") for n in names)
        # count model => debug txt with the count-group stats
        assert any(n.endswith("_debug.txt") for n in names)


class TestSaliency:
    def _model_fn(self):
        # simple differentiable scorer: weighted pixel sum per class
        w = jnp.asarray(np.random.default_rng(0).normal(size=(12, 12, 3, 2))
                        .astype(np.float32))

        def fn(xs):
            return jnp.einsum("bhwc,hwck->bk", xs, w)

        return fn

    def test_ig_completeness(self):
        """IG should approximately satisfy: sum(attr) ~ f(x) - f(baseline)
        for a linear model (exact for linear)."""
        from count_pipnet_tpu.interpret.saliency import IG
        fn = self._model_fn()
        x = np.random.default_rng(1).normal(size=(1, 12, 12, 3)) \
            .astype(np.float32)
        attr = IG(x, fn, steps=32, batch_size=16, alpha_star=1.0,
                  baseline=0.0, target_class=0)
        fx = float(fn(jnp.asarray(x))[0, 0])
        f0 = float(fn(jnp.zeros_like(jnp.asarray(x)))[0, 0])
        assert float(attr.sum()) == pytest.approx(fx - f0, rel=1e-3)

    def test_idg_runs_and_is_finite(self):
        from count_pipnet_tpu.interpret.saliency import IDG
        fn = self._model_fn()
        x = np.random.default_rng(2).normal(size=(1, 12, 12, 3)) \
            .astype(np.float32)
        attr = IDG(x, fn, steps=32, batch_size=16, baseline=0.0,
                   target_class=1)
        assert attr.shape == (12, 12, 3)
        assert np.all(np.isfinite(attr))

    def test_guided_ig_linear_model(self):
        from count_pipnet_tpu.interpret.saliency import guided_ig
        fn = self._model_fn()
        x = np.random.default_rng(3).normal(size=(1, 12, 12, 3)) \
            .astype(np.float32)
        attr = guided_ig(x, fn, steps=16, target_class=0)
        fx = float(fn(jnp.asarray(x))[0, 0])
        f0 = float(fn(jnp.zeros_like(jnp.asarray(x)))[0, 0])
        # completeness holds for guided IG on linear models too
        assert float(attr.sum()) == pytest.approx(fx - f0, rel=5e-2)

    def test_visualizers(self):
        from count_pipnet_tpu.interpret.saliency import (
            visualize_grayscale, visualize_diverging,
        )
        attr = np.random.default_rng(4).normal(size=(8, 8, 3)) \
            .astype(np.float32)
        g = visualize_grayscale(attr)
        assert g.shape == (8, 8) and g.min() >= 0 and g.max() <= 1
        d = visualize_diverging(attr)
        assert d.min() >= -1 and d.max() <= 1


class TestInterpExplorer:
    """Self-contained interactive class<->prototype explorer
    (notebooks/interp_explorer.py): valid embedded matrix, class list,
    and hover/click handlers with no external dependencies."""

    def test_html_self_contained(self):
        import json
        import re
        import sys
        sys.path.insert(0, "/root/repo")
        from notebooks.interp_explorer import build_explorer

        run_dir = "/root/repo/runs/sweep_r2/onehot_seed1_20260816_231438"
        if not os.path.exists(os.path.join(run_dir, "metadata",
                                           "args.pickle")):
            pytest.skip("no committed trained run available")
        out = build_explorer(run_dir)
        html = open(out).read()
        assert "<script src" not in html  # no CDN/external scripts
        w = json.loads(re.search(r"const W = (\[\[.*?\]\]);",
                                 html, re.S).group(1))
        classes = json.loads(re.search(r"const classNames = (\[.*?\]);",
                                       html, re.S).group(1))
        assert len(w) == len(classes) > 0
        assert len(w[0]) > 0
        for frag in ("addEventListener('mousemove'",
                     "addEventListener('click'", "<select id=\"cls\">"):
            assert frag in html, frag

    def test_grouped_view(self, tmp_path):
        """Grouped explorer (reference main_interp.py:533-880): columns
        ordered by group priority under a colored band, per-prototype
        labels embedded, top-k filter control present."""
        import json
        import re
        import sys
        sys.path.insert(0, "/root/repo")
        from notebooks.interp_explorer import build_explorer

        run_dir = "/root/repo/runs/sweep_r2/onehot_seed1_20260816_231438"
        if not os.path.exists(os.path.join(run_dir, "metadata",
                                           "args.pickle")):
            pytest.skip("no committed trained run available")
        spec = {
            "groups": {"count": [0, 3], "shape": [4], "mixed": [2]},
            "labels": {"0": "Count-1", "4": "Circ(:)"},
        }
        gpath = tmp_path / "groups.json"
        gpath.write_text(json.dumps(spec))
        out = build_explorer(run_dir, out_path=str(tmp_path / "e.html"),
                             groups_json=str(gpath))
        html = open(out).read()
        defs = json.loads(re.search(r"const DEFS = (\[.*?\]);",
                                    html, re.S).group(1))
        assert defs[0]["label"] == "Count-1"
        assert defs[0]["group_name"] == "count"
        assert defs[4]["group_name"] == "shape"
        # shape has higher priority (lower number) than count
        assert defs[4]["order_priority"] < defs[0]["order_priority"]
        # unassigned prototypes fall into the dead group
        assert defs[1]["group_name"] == "dead"
        for frag in ('id="legend"', 'id="topk"', "order.sort"):
            assert frag in html, frag


class TestGroupDefinitions:
    """build_group_definitions validation semantics
    (reference main_interp.py:578-640)."""

    def test_overlap_raises(self):
        from count_pipnet_tpu.interpret.enums import (
            build_group_definitions)
        with pytest.raises(ValueError, match="multiple groups"):
            build_group_definitions(4, {"a": [0, 1], "b": [1]})

    def test_out_of_range_raises(self):
        from count_pipnet_tpu.interpret.enums import (
            build_group_definitions)
        with pytest.raises(ValueError, match="outside"):
            build_group_definitions(4, {"a": [7]})

    def test_dead_and_custom_groups(self):
        from count_pipnet_tpu.interpret.enums import (
            build_group_definitions)
        defs = build_group_definitions(
            5, {"count": [0], "texture": [2, 3]},
            labels={0: "Count-1"})
        assert [d["group_name"] for d in defs] == \
            ["count", "dead", "texture", "texture", "dead"]
        assert defs[0]["label"] == "Count-1"
        assert defs[1]["label"] == "Dead"
        # custom group gets a color and a priority after known groups
        assert defs[2]["color"].startswith("#")
        assert defs[2]["order_priority"] > defs[0]["order_priority"]
        # known-group colors come from the default palette
        from count_pipnet_tpu.interpret.enums import GROUP_COLORS
        assert defs[0]["color"] == GROUP_COLORS["count"]

    def test_registry_roundtrip(self):
        from count_pipnet_tpu.interpret.enums import (
            groups_for_run, register_groups)
        register_groups("runX", {"count": [1, 2]})
        assert groups_for_run("runX") == {"count": [1, 2]}
        assert groups_for_run("missing") == {}


class TestRunComparator:
    """Interactive cross-run comparator (notebooks/interp_many.py):
    self-contained HTML with every run's matrix embedded."""

    def test_comparison_html(self, tmp_path):
        import json
        import re
        import sys
        sys.path.insert(0, "/root/repo")
        sys.path.insert(0, "/root/repo/notebooks")
        from notebooks.interp_many import build_comparison_html

        expl = {
            "runA": {"weights": np.asarray([[0.0, 2.0], [1.0, 0.0]])},
            "runB": {"weights": np.asarray([[1.5, 0.0], [0.0, 0.5]])},
        }
        out = build_comparison_html(expl, str(tmp_path))
        html = open(out).read()
        assert "<script src" not in html
        runs = json.loads(re.search(r"const RUNS = (\{.*?\});\n",
                                    html, re.S).group(1))
        assert set(runs) == {"runA", "runB"}
        assert runs["runA"]["W"] == [[0.0, 2.0], [1.0, 0.0]]
        assert len(runs["runA"]["classes"]) == 2
        script = html.split("<script>")[1].split("</script>")[0]
        for o, c in [("{", "}"), ("(", ")"), ("[", "]")]:
            assert script.count(o) == script.count(c)
        for frag in ("drawScatter", "id=\"toggles\"",
                     "addEventListener('mousemove'"):
            assert frag in html, frag


class TestGroupedStaticHeatmap:
    """show_global_explanation with group_defs (reference
    main_interp.py:648-880): group-ordered columns, colored band,
    listing unaffected by the reorder."""

    def test_grouped_png(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo")
        sys.path.insert(0, "/root/repo/notebooks")
        from count_pipnet_tpu.interpret.enums import (
            build_group_definitions)
        from notebooks.main_interp import show_global_explanation

        w = np.zeros((3, 4)); w[0, 3] = 2.0; w[1, 0] = 1.0
        defs = build_group_definitions(
            4, {"shape": [3], "count": [0]}, labels={3: "Circ(:)"})
        out = tmp_path / "g.png"
        lines = show_global_explanation(
            {"weights": w}, str(out), group_defs=defs)
        assert out.exists() and out.stat().st_size > 0
        # listing keeps original prototype indices despite the reorder
        assert "P3(2.000)" in lines[0]
        assert "P0(1.000)" in lines[1]
