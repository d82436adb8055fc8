from dreamer_tpu.ops.gru_pallas import gru_cell_pallas

__all__ = ["gru_cell_pallas"]
