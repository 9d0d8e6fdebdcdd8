"""Operator-plugin protocol (SURVEY.md §2.11): the Custom
PipelineComponent surface — compiled SSIS components expose design-time
metadata (``ProvideComponentProperties``, ``Validate``) and runtime
hooks (``ProcessInput``; PRO/Глава 18:33,50-52).  The Spark-native
equivalent is a small class protocol over DataFrames:

  validate(schema)        design-time check against the input schema
  output_schema(schema)   declared output columns (drives downstream
                          validation without running the plan)
  apply(df)               the runtime transform (lazy DataFrame in/out)

Components are registered by name so pipeline specs can reference them
as data (the reference's 'configure without recompiling' goal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class ComponentValidationError(ValueError):
    pass


class PipelineComponent:
    """Base class; subclasses override ``required_columns``, ``apply``
    and optionally ``output_schema``/``validate``."""

    name: str = "component"
    required_columns: tuple[str, ...] = ()

    def validate(self, schema: T.StructType) -> list[str]:
        """Return a list of design-time errors (empty = valid)."""
        missing = [c for c in self.required_columns
                   if c not in schema.fieldNames()]
        return [f"{self.name}: missing required column {c!r}"
                for c in missing]

    def output_schema(self, schema: T.StructType) -> T.StructType:
        return schema

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        errors = self.validate(df.schema)
        if errors:
            raise ComponentValidationError("; ".join(errors))
        return self.apply(df)


_REGISTRY: dict[str, type[PipelineComponent]] = {}


def register(cls: type[PipelineComponent]) -> type[PipelineComponent]:
    """Class decorator: ``@register`` makes the component addressable by
    name from pipeline specs."""
    _REGISTRY[cls.name] = cls
    return cls


def component(name: str, **params) -> PipelineComponent:
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown component {name!r}; registered: "
                       f"{sorted(_REGISTRY)}") from None
    return cls(**params) if params else cls()
