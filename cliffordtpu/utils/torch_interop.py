"""torch ↔ flax parameter interop used by the parity harnesses.

The reference MLPVAE (``mnist/mlp_vae.py:19-56``) stores Linear weights as
(out, in); flax Dense kernels are (in, out), so every copy transposes.
"""

from __future__ import annotations

import jax.numpy as jnp


def torch_state_dict_to_numpy(torch_module):
    return {k: v.detach().cpu().numpy()
            for k, v in torch_module.state_dict().items()}


def copy_mlp_weights(sd, params, distribution: str):
    """Reference torch MLPVAE state_dict (numpy arrays) -> flax params.

    Layer map mirrors ``mnist/mlp_vae.py:26-47``: encoder.[0,2] -> enc1/2,
    decoder.[0,2,4] -> dec1/2/3, fc_mean, and fc_var (normal) or fc_scale
    (spherical families).
    """
    new = {k: dict(v) for k, v in params.items()}

    def set_dense(flax_name, torch_prefix):
        new[flax_name]["kernel"] = jnp.asarray(sd[f"{torch_prefix}.weight"].T)
        new[flax_name]["bias"] = jnp.asarray(sd[f"{torch_prefix}.bias"])

    set_dense("enc1", "encoder.0")
    set_dense("enc2", "encoder.2")
    set_dense("fc_mean", "fc_mean")
    if distribution == "normal":
        set_dense("fc_var", "fc_var")
    else:
        set_dense("fc_scale", "fc_scale")
    set_dense("dec1", "decoder.0")
    set_dense("dec2", "decoder.2")
    set_dense("dec3", "decoder.4")
    return new
