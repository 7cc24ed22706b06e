"""CSV import of external benchmark results."""

from .csv_import import CsvImporter, CsvSchema, CsvSchemaBuilder, ExternalResult

__all__ = ["CsvImporter", "CsvSchema", "CsvSchemaBuilder", "ExternalResult"]
