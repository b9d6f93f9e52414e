from .lgbm_model import LightGBMModel, Tree, load_model, parse_model_str

__all__ = ["LightGBMModel", "Tree", "load_model", "parse_model_str"]
