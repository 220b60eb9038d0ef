"""NeRFactor ablation: analytic GGX microfacet BRDF instead of the
learned prior; the per-point BRDF property becomes a scalar roughness in
[0, 1] (reference nerfactor/models/nerfactor_microfacet.py).
"""

import jax.numpy as jnp
import numpy as np

from nerfactor_tpu.models import networks
from nerfactor_tpu.models.nerfactor import Model as NeRFactorModel
from nerfactor_tpu.ops.microfacet import microfacet_spec
from nerfactor_tpu.utils.logging import Logger

logger = Logger(loggee="models/nerfactor_microfacet")


class Model(NeRFactorModel):
    uses_learned_brdf = False

    def _init_brdf_config(self, config):
        # Scalar roughness; no learned prior, no Rusinkiewicz embedding
        # (reference nerfactor_microfacet.py:37-41)
        self.pred_brdf = config.getboolean('pred_brdf')
        self.brdf_model_ckpt = None
        self.config_brdf = None
        self.z_dim = 1
        self.normalize_brdf_z = False
        self.pos_enc_rusink = False
        self.n_freqs_rusink = None
        self.fresnel_f0 = config.getfloat('fresnel_f0', fallback=0.04)

    def _make_brdf_z_out_spec(self):
        # Sigmoid so roughness lands in [0, 1]
        # (nerfactor_microfacet.py:112-117)
        return networks.MLPSpec(
            self.specs['brdf_z_mlp'].out_dim, [self.z_dim], acts='sigmoid')

    def eval_spec_at(self, params, pts2l, pts2c, normal, brdf_prop):
        # Achromatic GGX lobe; the base class composes albedo/pi + spec
        # (eval_brdf_at) and contracts lights matmul-style (render)
        del params  # analytic BRDF has no learned weights
        return microfacet_spec(
            pts2l, pts2c, normal, rough=brdf_prop, f0=self.fresnel_f0)

    def _brdf_prop_as_img(self, brdf_prop, seen_z):
        del seen_z
        return np.concatenate([brdf_prop] * 3, axis=-1)
