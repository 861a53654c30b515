package graft.cli

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Instance skeleton generator (reference: `minerva quick-start`,
  * src/minerva/commands/quick_start.py — renders a templated resource tree
  * into an instance root). graft writes a minimal but COMPLETE bundle —
  * every subsystem has one worked example (trend store, attribute store,
  * typed notification store, relation, virtual entity, trigger, sample
  * data) — so `initialize --load-sample-data <dir>` immediately produces a
  * populated instance to explore.
  *
  * The skeleton's entity is a `router` reporting rx/tx counters; names are
  * prefixed with `instanceName` only where the reference templates
  * substitute too (the data source), keeping generated bundles from two
  * instances distinguishable side by side.
  */
object QuickStart {

  def write(dir: String, instanceName: String): Seq[String] = {
    val ds = if (instanceName == "default") "net" else instanceName
    val files: Seq[(String, String)] = Seq(
      s"trend/${ds}_router_15m.yaml" ->
        s"""title: Raw router counters
           |data_source: $ds
           |entity_type: router
           |granularity: 15m
           |partition_size: 1d
           |parts:
           |  - name: ${ds}_router_main_15m
           |    trends:
           |      - name: rx_mb
           |        data_type: double precision
           |      - name: tx_mb
           |        data_type: double precision
           |""".stripMargin,
      "attribute/inventory_router.yaml" ->
        """title: Router inventory attributes
          |data_source: inventory
          |entity_type: router
          |attributes:
          |  - name: vendor
          |    data_type: text
          |  - name: ports
          |    data_type: integer
          |""".stripMargin,
      "notification/alerts.yaml" ->
        """data_source: ops-notif
          |entity_type: notification
          |attributes:
          |  - name: details
          |    data_type: text
          |  - name: weight
          |    data_type: integer
          |  - name: created
          |    data_type: timestamp with time zone
          |""".stripMargin,
      "virtual-entity/v-region.sql" ->
        """CREATE OR REPLACE VIEW virtual_entity."v-region" AS
          |SELECT name
          |FROM (VALUES ('north'), ('south')) AS s(name);
          |
          |SELECT directory.create_entity_type('v-region');
          |
          |INSERT INTO entity."v-region" (name)
          |SELECT name FROM virtual_entity."v-region"
          |ON CONFLICT DO NOTHING;
          |""".stripMargin,
      "relation/router-to-v-region.yaml" ->
        """name: router->v-region
          |source_entity_type: router
          |target_entity_type: v-region
          |query: |-
          |  SELECT
          |    r.id AS source_id,
          |    vr.id AS target_id
          |  FROM entity."router" r
          |  JOIN entity."v-region" vr ON vr.name = substring(r.name from '([a-z]+)-.*')
          |  GROUP BY r.id, vr.id
          |""".stripMargin,
      "trigger/router-15m-rxhigh.yaml" ->
        s"""name: router/15m/rxhigh
           |kpi_data:
           |  - name: rx_mb
           |    data_type: numeric
           |thresholds:
           |  - name: max_rx
           |    data_type: numeric
           |    value: 10
           |condition: |-
           |  rx_mb > max_rx
           |weight: |-
           |  SELECT
           |      CASE
           |          WHEN $$1.rx_mb > 20 THEN 900
           |          ELSE 100
           |      END
           |notification: |-
           |  SELECT format('rx %s exceeds %s', $$1.rx_mb, $$1.max_rx)
           |notification_store: alerts
           |trend_store_links:
           |  - part_name: ${ds}_router_main_15m
           |    mapping_function: mapping_id
           |granularity: 15m
           |""".stripMargin,
      "sample-data/definition.yaml" ->
        s"""- native:
           |    name: routers
           |    data_source: $ds
           |    type: trend
           |    data_type: csv
           |    granularity: 15m
           |    parser_config:
           |      timestamp: timestamp
           |      identifier: router
           |      granularity: 15m
           |      entity_type: router
           |      delimiter: ","
           |      columns:
           |        - name: timestamp
           |          data_type: text
           |        - name: router
           |          data_type: text
           |        - name: rx_mb
           |          data_type: double precision
           |        - name: tx_mb
           |          data_type: double precision
           |- native:
           |    name: router-attrs
           |    data_source: inventory
           |    type: attribute
           |    data_type: csv
           |    granularity: 15m
           |    parser_config:
           |      timestamp: timestamp
           |      identifier: router
           |      entity_type: router
           |      delimiter: ","
           |      columns:
           |        - name: timestamp
           |          data_type: text
           |        - name: router
           |          data_type: text
           |        - name: vendor
           |          data_type: text
           |        - name: ports
           |          data_type: integer
           |""".stripMargin,
      "sample-data/routers.csv" ->
        """router,timestamp,rx_mb,tx_mb
          |north-r1,2020-08-25T14:00:00Z,25.5,3.5
          |north-r2,2020-08-25T14:00:00Z,5.0,1.0
          |south-r1,2020-08-25T14:00:00Z,12.0,2.0
          |""".stripMargin,
      "sample-data/router-attrs.csv" ->
        """router,timestamp,vendor,ports
          |north-r1,2020-08-25T14:00:00Z,acme,48
          |north-r2,2020-08-25T14:00:00Z,acme,24
          |south-r1,2020-08-25T14:00:00Z,zenith,48
          |""".stripMargin)
    files.map { case (rel, content) =>
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      rel
    }
  }
}
