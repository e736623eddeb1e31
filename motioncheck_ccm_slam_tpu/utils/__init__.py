from .ids import IdPair, UniqueIdDispenser, KF_RANGE, MP_RANGE, MAP_RANGE

__all__ = ["IdPair", "UniqueIdDispenser", "KF_RANGE", "MP_RANGE", "MAP_RANGE"]
