"""Declarative dataset schemas + column-role registry (SURVEY.md §1).

The reference hard-codes a 42-name array and per-column casts
(reference README.md:91-158); the engine states the same facts once,
declaratively, and derives loaders/encoders from the registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# --- NSL-KDD connection-record schema -------------------------------------
# 41 features + labels (+ trailing difficulty column present in the raw
# files but dropped by the reference loader — README.md:91-100,115).

NSL_KDD_COLUMNS: list[tuple[str, str]] = [
    ("duration", "numeric"),
    ("protocol_type", "nominal"),
    ("service", "nominal"),
    ("flag", "nominal"),
    ("src_bytes", "numeric"),
    ("dst_bytes", "numeric"),
    ("land", "binary"),
    ("wrong_fragment", "numeric"),
    ("urgent", "numeric"),
    ("hot", "numeric"),
    ("num_failed_logins", "numeric"),
    ("logged_in", "binary"),
    ("num_compromised", "numeric"),
    ("root_shell", "binary"),
    ("su_attempted", "binary"),
    ("num_root", "numeric"),
    ("num_file_creations", "numeric"),
    ("num_shells", "numeric"),
    ("num_access_files", "numeric"),
    ("num_outbound_cmds", "numeric"),
    ("is_host_login", "binary"),
    ("is_guest_login", "binary"),
    ("count", "numeric"),
    ("srv_count", "numeric"),
    ("serror_rate", "numeric"),
    ("srv_serror_rate", "numeric"),
    ("rerror_rate", "numeric"),
    ("srv_rerror_rate", "numeric"),
    ("same_srv_rate", "numeric"),
    ("diff_srv_rate", "numeric"),
    ("srv_diff_host_rate", "numeric"),
    ("dst_host_count", "numeric"),
    ("dst_host_srv_count", "numeric"),
    ("dst_host_same_srv_rate", "numeric"),
    ("dst_host_diff_srv_rate", "numeric"),
    ("dst_host_same_src_port_rate", "numeric"),
    ("dst_host_srv_diff_host_rate", "numeric"),
    ("dst_host_serror_rate", "numeric"),
    ("dst_host_srv_serror_rate", "numeric"),
    ("dst_host_rerror_rate", "numeric"),
    ("dst_host_srv_rerror_rate", "numeric"),
    ("labels", "label"),
]


@dataclass(frozen=True)
class ColumnRoles:
    """Column-role map: the reference's nominal/binary/numeric index
    lists (README.md:102-108) generalized to any dataset."""

    nominal: tuple[str, ...] = ()
    binary: tuple[str, ...] = ()
    numeric: tuple[str, ...] = ()
    label: tuple[str, ...] = ()

    @property
    def features(self) -> tuple[str, ...]:
        return self.nominal + self.binary + self.numeric


def nsl_kdd_roles() -> ColumnRoles:
    by_role: dict[str, list[str]] = {"nominal": [], "binary": [], "numeric": [], "label": []}
    for name, role in NSL_KDD_COLUMNS:
        by_role[role].append(name)
    return ColumnRoles(
        nominal=tuple(by_role["nominal"]),
        binary=tuple(by_role["binary"]),
        numeric=tuple(by_role["numeric"]),
        label=tuple(by_role["label"]),
    )


def nsl_kdd_schema(include_difficulty: bool = False) -> StructType:
    """Read-time schema: nominal/label -> string, everything else ->
    double (the reference's explicit cast list, README.md:116-158).
    ``include_difficulty=True`` keeps the 43rd field the reference
    silently drops."""
    fields = [
        StructField(name, StringType() if role in ("nominal", "label") else DoubleType())
        for name, role in NSL_KDD_COLUMNS
    ]
    if include_difficulty:
        fields.append(StructField("difficulty", IntegerType()))
    return StructType(fields)


# --- 5-class attack taxonomy (README.md:173-220) ---------------------------

ATTACK_TAXONOMY: dict[str, tuple[str, ...]] = {
    "normal": ("normal",),
    "DoS": (
        "back", "land", "neptune", "pod", "smurf", "teardrop",
        "mailbomb", "apache2", "processtable", "udpstorm",
    ),
    "Probe": ("ipsweep", "nmap", "portsweep", "satan", "mscan", "saint"),
    "R2L": (
        "ftp_write", "guess_passwd", "imap", "multihop", "phf", "spy",
        "warezclient", "warezmaster", "sendmail", "named",
        "snmpgetattack", "snmpguess", "xlock", "xsnoop", "worm",
    ),
    "U2R": (
        "buffer_overflow", "loadmodule", "perl", "rootkit",
        "httptunnel", "ps", "sqlattack", "xterm",
    ),
}


def attack_mapping() -> dict[str, str]:
    """label -> 5-class mapping (the reference's ``attack_dict``)."""
    return {label: cls for cls, labels in ATTACK_TAXONOMY.items() for label in labels}


# --- synthetic testdata catalog (TESTDATA.md) ------------------------------

TESTDATA_TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@dataclass(frozen=True)
class Dataset:
    """A named dataset: schema + roles, driving generic encoders."""

    name: str
    schema: StructType
    roles: ColumnRoles = field(default_factory=ColumnRoles)
