import jax
import jax.numpy as jnp
import numpy as np

from tinynerf.core import mlp


def test_param_count_matches_reference():
    # SURVEY.md §2.6: current reference Network has 593,924 parameters
    params = mlp.init_network(jax.random.PRNGKey(0))
    assert mlp.num_params(params) == 593_924


def test_layer_shapes():
    dims = dict((n, (fi, fo)) for n, fi, fo in mlp.layer_dims())
    assert dims["trunk_0"] == (60, 256)
    assert dims["trunk_4"] == (316, 256)   # skip layer re-concats the input
    assert dims["trunk_5"] == (256, 256)
    assert dims["sigma"] == (256, 1)
    assert dims["point_info"] == (256, 256)
    assert dims["dir_info"] == (280, 128)  # 256 + 24 view branch
    assert dims["color"] == (128, 3)


def test_forward_shapes_and_ranges():
    params = mlp.init_network(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    pe = jax.random.normal(key, (4, 9, 60))
    de = jax.random.normal(key, (4, 9, 24))
    color, sigma = mlp.apply_network(params, pe, de)
    assert color.shape == (4, 9, 3)
    assert sigma.shape == (4, 9, 1)
    assert np.all(np.asarray(sigma) >= 0)            # abs activation (Q14)
    assert np.all((np.asarray(color) > 0) & (np.asarray(color) < 1))  # sigmoid


def test_init_distribution_matches_torch_default():
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for w and b
    params = mlp.init_network(jax.random.PRNGKey(3))
    w = np.asarray(params["trunk_1"]["w"])
    bound = 1.0 / np.sqrt(256)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.9 * bound  # actually fills the range
    b = np.asarray(params["trunk_1"]["b"])
    assert np.abs(b).max() <= bound


def test_grad_flows_everywhere():
    params = mlp.init_network(jax.random.PRNGKey(4))
    pe = jnp.ones((2, 3, 60)) * 0.1
    de = jnp.ones((2, 3, 24)) * 0.1

    def loss(p):
        c, s = mlp.apply_network(p, pe, de)
        return jnp.sum(c) + jnp.sum(s)

    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        assert float(jnp.sum(jnp.abs(g["w"]))) > 0, name
