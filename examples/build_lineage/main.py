"""Selector DSL over a data-pipeline DAG: rebuild sets, deploy closures."""

from muninn_tpu import Graph, select

# sources -> staging -> marts -> dashboards
DEPS = [
    ("raw_orders", "stg_orders"), ("raw_users", "stg_users"),
    ("raw_events", "stg_events"),
    ("stg_orders", "fct_sales"), ("stg_users", "fct_sales"),
    ("stg_users", "dim_users"), ("stg_events", "fct_engagement"),
    ("fct_sales", "dash_revenue"), ("dim_users", "dash_revenue"),
    ("fct_engagement", "dash_growth"), ("dim_users", "dash_growth"),
]


def names(rows) -> list[str]:
    return sorted(n for n, _, _ in rows)


def main() -> dict:
    g = Graph.from_edges(*zip(*DEPS))

    rebuild = names(select(g, "stg_users+"))
    print("stg_users changed -> rebuild:", rebuild)

    deploy = names(select(g, "+dash_revenue"))
    print("deploy dash_revenue needs  :", deploy)

    near = names(select(g, "1+dash_revenue"))
    print("direct inputs of dash_revenue:", near)

    shared = names(select(g, "+dash_revenue,+dash_growth"))
    print("shared upstream of both dashboards:", shared)

    unaffected = names(select(g, "not stg_users+"))
    print("unaffected by stg_users:", unaffected)

    closure = list(select(g, "@fct_sales"))
    print("runnable closure of fct_sales:")
    for node, depth, direction in sorted(closure, key=lambda r: (r[1], r[0])):
        print(f"  {node:16} depth={depth} {direction}")
    assert "dash_revenue" in {n for n, _, _ in closure}
    return {"rebuild": rebuild, "deploy": deploy}


if __name__ == "__main__":
    main()
