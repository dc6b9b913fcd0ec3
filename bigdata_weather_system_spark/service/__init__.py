from .weather import WeatherService, coerce_value, row_to_record

__all__ = ["WeatherService", "coerce_value", "row_to_record"]
