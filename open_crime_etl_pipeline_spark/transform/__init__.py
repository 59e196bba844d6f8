from .crime import transform_crime_page
from .datedim import build_date_dim, default_holidays_df

__all__ = ["transform_crime_page", "build_date_dim", "default_holidays_df"]
