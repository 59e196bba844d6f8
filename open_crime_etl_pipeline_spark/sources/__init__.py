from .socrata import SocrataCrimeDataSource, register_socrata_source  # noqa: F401
