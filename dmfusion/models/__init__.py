from dmfusion.models.registry import (  # noqa: F401
    available_models,
    build_model,
    get_model_class,
    register,
)
