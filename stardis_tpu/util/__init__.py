from stardis_tpu.util.species import (
    element_symbol2atomic_number,
    atomic_number2element_symbol,
    species_string_to_tuple,
    species_tuple_to_string,
)

__all__ = [
    "element_symbol2atomic_number",
    "atomic_number2element_symbol",
    "species_string_to_tuple",
    "species_tuple_to_string",
]
