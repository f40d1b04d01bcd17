from .registry import AggregateFunction, CustomFunction, FunctionRegistry

__all__ = ["AggregateFunction", "CustomFunction", "FunctionRegistry"]
