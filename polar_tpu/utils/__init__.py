from polar_tpu.utils.numerics import int_mod_2, expand_to_rank, insert_dims
