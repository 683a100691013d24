"""Source/sink adapters (SURVEY.md §2.1-2.2).

kafka_io    — Kafka source/sink builders + Confluent wire-format framing
avro_codec  — minimal pure-Python Avro binary codec for flat records
              (offline stand-in for spark-avro's from_avro/to_avro)
"""
