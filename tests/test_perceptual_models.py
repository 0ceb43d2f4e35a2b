"""LPIPS / InceptionV3 architectures: shape checks + import mapping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.metrics.inception import (
    InceptionV3Features,
    import_inception_torch_state,
)
from image_restoration_and_enhancement_tpu.metrics.perceptual import (
    LPIPSAlex,
    import_lpips_torch_state,
)


def test_lpips_arch_shapes_and_symmetry():
    model = LPIPSAlex()
    a = jnp.zeros((1, 64, 64, 3))
    b = jnp.ones((1, 64, 64, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), a, b)
    d_ab = model.apply(params, a, b)
    d_ba = model.apply(params, b, a)
    d_aa = model.apply(params, a, a)
    assert d_ab.shape == (1,)
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-5)
    assert float(d_aa[0]) < 1e-6
    assert float(d_ab[0]) > 0


def test_lpips_torch_import_mapping():
    state = {
        "net.features.0.weight": np.zeros((64, 3, 11, 11), np.float32),
        "net.features.0.bias": np.zeros(64, np.float32),
        "net.features.3.weight": np.zeros((192, 64, 5, 5), np.float32),
        "lins.0.model.1.weight": np.ones((1, 64, 1, 1), np.float32),
        "lins.4.model.1.weight": np.ones((1, 256, 1, 1), np.float32),
    }
    tree = import_lpips_torch_state(state)
    assert tree["alex"]["conv1"]["kernel"].shape == (11, 11, 3, 64)
    assert tree["alex"]["conv2"]["kernel"].shape == (5, 5, 64, 192)
    assert tree["lin0"].shape == (64,)
    assert tree["lin4"].shape == (256,)


@pytest.mark.slow
def test_inception_arch_output_dim():
    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    params = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda p: model.apply(p, x),
        params,
    )
    assert out.shape == (1, 2048)


def test_inception_import_mapping_structure():
    state = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones(32, np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones(32, np.float32),
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros((), np.int64),
        "Mixed_5b.branch1x1.conv.weight": np.zeros((64, 192, 1, 1), np.float32),
        "Mixed_5b.branch1x1.bn.running_var": np.ones(64, np.float32),
        "fc.weight": np.zeros((1000, 2048), np.float32),
    }
    tree = import_inception_torch_state(state)
    assert tree["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert tree["Conv2d_1a_3x3"]["bn_scale"].shape == (32,)
    assert tree["Conv2d_1a_3x3"]["bn_var"].shape == (32,)
    assert tree["Mixed_5b"]["branch1x1"]["conv"]["kernel"].shape == (1, 1, 192, 64)
    assert "fc" not in tree


def test_rrdbnet_arch_and_import_mapping():
    from image_restoration_and_enhancement_tpu.models.rrdbnet import (
        RRDBNet,
        import_rrdb_torch_state,
    )

    model = RRDBNet(num_blocks=2, features=8, growth=4)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 32, 32, 3)  # x4

    state = {
        "conv_first.weight": np.zeros((8, 3, 3, 3), np.float32),
        "conv_first.bias": np.zeros(8, np.float32),
        "body.0.rdb1.conv1.weight": np.zeros((4, 8, 3, 3), np.float32),
        "body.0.rdb1.conv1.bias": np.zeros(4, np.float32),
        "conv_last.weight": np.zeros((3, 8, 3, 3), np.float32),
    }
    tree = import_rrdb_torch_state(state)
    assert tree["conv_first"]["kernel"].shape == (3, 3, 3, 8)
    assert tree["body_0"]["rdb1"]["conv1"]["kernel"].shape == (3, 3, 8, 4)
    assert tree["conv_last"]["kernel"].shape == (3, 3, 8, 3)


def test_inception_import_covers_every_param():
    """Full-coverage structural gate: synthesize the complete torchvision
    state dict from our init tree's paths, import it, and require the
    imported tree to match the init tree exactly (same paths, same
    shapes). Catches silently-dropped keys — the bug class the RRDB
    importer had with conv_body (see models/rrdbnet.py)."""
    import jax
    from image_restoration_and_enhancement_tpu.metrics.inception import (
        InceptionV3Features,
    )

    model = InceptionV3Features()
    x = jnp.zeros((1, 75, 75, 3))
    init = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    init = init["params"] if "params" in init else init

    leaf_map = {"bn_scale": "bn.weight", "bn_bias": "bn.bias",
                "bn_mean": "bn.running_mean", "bn_var": "bn.running_var"}
    state = {}

    def rec(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                rec(prefix + [k], v)
            elif k == "kernel":  # conv HWIO -> torch OIHW
                state[".".join(prefix) + ".weight"] = np.zeros(
                    (v.shape[3], v.shape[2], v.shape[0], v.shape[1]), np.float32)
            else:
                state[".".join(prefix + [leaf_map[k]])] = np.zeros(
                    v.shape, np.float32)

    rec([], init)
    tree = import_inception_torch_state(state)

    def flat(t, pre=""):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out.update(flat(v, pre + k + "/"))
            else:
                out[pre + k] = tuple(v.shape)
        return out

    want, have = flat(init), flat(tree)
    assert set(want) == set(have), (
        sorted(set(want) - set(have))[:5], sorted(set(have) - set(want))[:5])
    for k in want:
        assert want[k] == have[k], (k, want[k], have[k])
