"""Job-queue facade: the reference's submit/manager surface.

The reference queues jobs FIFO with incrementing job ids and runs them
serially (mapreduce/manager/__main__.py:44-45,76,259-263); submission
is a JSON message with input/output dirs, executables, and M/R
(mapreduce/submit.py:80-88). Here a job is a closure over one
SparkSession; the queue runs jobs in submission order. Worker
membership, heartbeats, failure detection, and task retry are Spark's
own (executor registration, ``spark.network.timeout``,
``spark.task.maxFailures``) — nothing to rebuild.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .operators.pipe import run_streaming_job


@dataclass
class StreamingJob:
    """The reference's new_manager_job message shape (submit.py:80-88)."""

    input_directory: str
    output_directory: str
    mapper_executable: str
    reducer_executable: str
    num_mappers: int = 2
    num_reducers: int = 1


@dataclass
class MapReduceEngine:
    spark: SparkSession
    _queue: list[tuple[int, StreamingJob]] = field(default_factory=list)
    _next_job_id: int = 0

    def submit_job(self, job: StreamingJob) -> int:
        """Enqueue; job ids increment from 0 like the reference manager."""
        job_id = self._next_job_id
        self._next_job_id += 1
        self._queue.append((job_id, job))
        return job_id

    def run_pending(self) -> list[int]:
        """Run queued jobs FIFO (the reference executes serially)."""
        done = []
        while self._queue:
            job_id, job = self._queue.pop(0)
            run_streaming_job(
                self.spark,
                job.input_directory,
                job.output_directory,
                job.mapper_executable,
                job.reducer_executable,
                num_mappers=job.num_mappers,
                num_reducers=job.num_reducers,
            )
            done.append(job_id)
        return done
