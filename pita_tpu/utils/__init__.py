from pita_tpu.utils.mean_free import remove_mean, remove_mean_flat
