from lsqrrecipes_tpu.viz.inventor import InventorScene

__all__ = ["InventorScene"]
