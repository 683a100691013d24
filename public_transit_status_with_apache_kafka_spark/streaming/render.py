"""K6 dashboard rendering (consumers/templates/status.html): the
reference serves an HTML table per line — station rows with direction
a/b occupants ('---' when empty) and turnstile entries, plus a weather
header. The engine's serving layer renders the same view from the
dashboard DataFrame; the text form here is the template's content
without the markup (the web shim is transport, not engine logic)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def render_dashboard(
    dashboard_df: DataFrame, weather_row=None, max_rows: int = 1000
) -> str:
    """Text render of the dashboard snapshot (status.html:14,29-39):
    weather header, then per-line blocks in blue->green->red order with
    stations by platform order. The input DataFrame already carries that
    ordering (cta_views.dashboard O2)."""
    lines_out = []
    if weather_row is not None:
        lines_out.append(
            f"Weather: {int(weather_row.temperature)}F and {weather_row.status}"
        )
    current_line = None
    for r in dashboard_df.limit(max_rows).collect():
        if r.line != current_line:
            current_line = r.line
            lines_out.append(f"== {str(current_line).title()} Line ==")
            lines_out.append(f"{'station':<16}{'dir a':<8}{'dir b':<8}entries")
        lines_out.append(
            f"{r.station_name:<16}{r.train_a:<8}{r.train_b:<8}{r.entries}"
        )
    return "\n".join(lines_out)
