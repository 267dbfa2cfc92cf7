from .fb_kernel import fb_apply_pallas, pallas_available
