"""CSV round-trip for experiment results (reference createAndSave.py:32-242).

Schema contract:
- ``results.csv`` — one row per parameter config; aggregate columns are
  named "<key> avg" / "<key> std" / "<key> raw" (raw holds a stringified
  Python list), exactly as the reference writes them
  (experiments.py:528-533, createAndSave.py:47).
- ``summary.csv`` — the "avg" columns plus the identifying parameter
  columns (createAndSave.py:50-54).

Loaders parse stringified raw lists back to typed Python lists, including
legacy ``np.int64(...)`` / ``np.float64(...)`` reprs that appear in CSVs
written by recent NumPy (createAndSave.py:117-139).
"""

from __future__ import annotations

import ast
import os
import re

import pandas as pd

_SUMMARY_ID_COLS = ["num_reads", "read_length", "error_prob",
                    "expected_coverage"]

_INT_RAW_COLS = {"num_reads raw", "read_length raw", "k raw",
                 "Number of Contigs raw", "N50 raw"}
_FLOAT_RAW_COLS = {"error_prob raw", "Mismatch Rate Aligned Regions raw",
                   "Mismatch Rate Genome Level raw", "expected_coverage raw",
                   "Genome Coverage raw"}

_NP_INT = re.compile(r"np\.int\d*\((-?\d+)\)")
_NP_FLOAT = re.compile(r"np\.float\d*\(([-\d.eE+]+)\)")


def save_results(results: list[dict], experiment_name: str,
                 path: str = "results") -> None:
    """Write results.csv (full) and summary.csv (avg columns) under `path`."""
    df = pd.DataFrame(results)
    os.makedirs(path, exist_ok=True)
    df.to_csv(os.path.join(path, "results.csv"), index=False)
    keep = [c for c in df.columns if "avg" in c or c in _SUMMARY_ID_COLS]
    df[keep].to_csv(os.path.join(path, "summary.csv"), index=False)
    print(f"Results saved to {path}/results.csv")
    print(f"Summary results saved to {path}/summary.csv")


def load_results_from_csv(file_path: str) -> list[dict] | None:
    try:
        return pd.read_csv(file_path).to_dict("records")
    except FileNotFoundError:
        print(f"Error: File not found at {file_path}")
    except pd.errors.EmptyDataError:
        print(f"Warning: {file_path} is empty.")
    except Exception as e:  # pragma: no cover - parity with reference
        print(f"An error occurred while loading {file_path}: {e}")
    return None


def parse_list_with_numpy(x, col: str):
    """Parse a stringified list cell; coerce per-column element types.

    Accepts legacy numpy scalar reprs inside the string
    (createAndSave.py:123-124). Non-list literals are returned as-is.
    """
    try:
        x = _NP_INT.sub(r"\1", x)
        x = _NP_FLOAT.sub(r"\1", x)
        value = ast.literal_eval(x)
        if not isinstance(value, list):
            return value
        if col in _INT_RAW_COLS:
            return [int(v) for v in value]
        if col in _FLOAT_RAW_COLS:
            return [float(v) for v in value]
        return value
    except (ValueError, SyntaxError) as e:
        print(f"Error converting column: {e} - value: {x}")
        return None


def load_and_clean_results(folder_path: str) -> list[dict] | None:
    """Load `folder_path`/results.csv with raw-list columns parsed back to
    typed Python lists (createAndSave.py:142-179)."""
    file_path = os.path.join(folder_path, "results.csv")
    try:
        df = pd.read_csv(file_path)
        for col in [c for c in df.columns if c.endswith("raw")]:
            df[col] = df[col].apply(lambda x: parse_list_with_numpy(x, col))
        return df.to_dict("records")
    except FileNotFoundError:
        print(f"Error: File not found at {file_path}")
    except pd.errors.EmptyDataError:
        print(f"Warning: {file_path} is empty.")
    except Exception as e:  # pragma: no cover
        print(f"An error occurred while loading or cleaning {file_path}: {e}")
    return None


def load_coverage_results_from_csv(base_path: str,
                                   name_pattern: str) -> dict:
    """Map coverage level -> results list from `base_path`/<pattern><C>/
    results.csv directories (createAndSave.py:84-114)."""
    out: dict[float, list | None] = {}
    for dir_name in os.listdir(base_path):
        if not dir_name.startswith(name_pattern):
            continue
        try:
            coverage = float(dir_name.split("_")[1])
        except (IndexError, ValueError):
            print(f"Skipping directory {dir_name} - could not extract coverage")
            continue
        out[coverage] = load_results_from_csv(
            os.path.join(base_path, dir_name, "results.csv"))
    return out


def load_and_combine_results(base_path: str) -> list[dict]:
    """Concatenate cleaned results from every immediate subdirectory
    (createAndSave.py:182-218)."""
    combined: list[dict] = []
    for dir_name in sorted(os.listdir(base_path)):
        subdir = os.path.join(base_path, dir_name)
        if os.path.isdir(subdir):
            results = load_and_clean_results(subdir)
            if results:
                combined.extend(results)
    return combined


def load_all_results(base_path: str) -> tuple[dict, list]:
    """(subdir name -> results, list of result lists)
    (createAndSave.py:221-241)."""
    by_name: dict[str, list] = {}
    as_list: list[list] = []
    for dir_name in sorted(os.listdir(base_path)):
        subdir = os.path.join(base_path, dir_name)
        if os.path.isdir(subdir):
            results = load_and_clean_results(subdir)
            if results:
                by_name[dir_name] = results
                as_list.append(results)
    return by_name, as_list
